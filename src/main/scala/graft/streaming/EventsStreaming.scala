package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-Streaming surface over the `events` table (SURVEY §2.9 —
  * absent in the reference, declared as an engine extension): tumbling /
  * sliding / session windows with watermarks, and streaming dedup.
  *
  * Every transform here is written against a plain DataFrame so the SAME
  * function body serves batch (`spark.read`) and streaming
  * (`spark.readStream`) inputs — batch-vs-stream parity is asserted in
  * StreamingSpec by running both paths over the same parquet.
  *
  * Scale: windowed aggregations shuffle on (window, key); watermarks
  * bound state. Session windows keep per-key state until
  * watermark + gap — at 100 TB the watermark delay is the knob that
  * caps state store size.
  */
object EventsStreaming {

  /** Spark-side schema of the events table after ts normalization
    * (needed by readStream, which cannot infer). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Tumbling 1-hour counts per event type (streaming twin of Q14). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("window.start").as("w"), col("event_type"),
        col("n"), col("v"))

  /** Sliding 1-hour/30-minute counts. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("event_type"), col("n"))

  /** Gap-based sessions per user via `session_window` — the engine-native
    * form whose batch semantics are locked against the lag+running-sum
    * formulation (q28 oracle; boundary: a gap of exactly 30m starts a
    * new session, hence `>=` in the oracle). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))

  /** Sessions-per-user summary (batch form, comparable to Q15). */
  def sessionsPerUser(events: DataFrame): DataFrame =
    sessionCounts(events)
      .groupBy("user_id")
      .agg(count(lit(1)).as("sessions"), sum("n").cast("long").as("events"))
      .orderBy("user_id")

  /** Stream–static enrichment join: the streaming side joins a static
    * dimension frame (broadcast per micro-batch) — the standard shape
    * for attaching slowly-changing attributes to an event stream
    * without watermark bookkeeping. Works identically on batch input. */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"))

  /** Stream–stream interval self-join: each purchase joined to the
    * clicks that preceded it by at most one hour for the same user —
    * BOTH sides are streams. The per-side watermarks plus the
    * time-interval join predicate are what let Spark bound the join
    * state: a buffered click can be evicted once the purchase-side
    * watermark passes c_ts + 1h, so state is O(events per horizon), not
    * O(stream length) — the property that keeps a stream-stream join
    * alive at 100 TB/day. The same body runs on batch frames
    * (withWatermark is a no-op there); parity locked in StreamingSpec. */
  def clicksBeforePurchase(events: DataFrame): DataFrame = {
    val (clicks, purchases) = clickPurchaseSides(events)
    clicks.join(purchases, clickPurchaseCond)
      .select(col("p_user").as("user_id"), col("p_event"), col("c_event"))
  }

  /** Stream-stream LEFT OUTER interval join: every purchase, with the
    * clicks that preceded it by at most one hour — or ONE null-click
    * row when no such click exists. The outer row cannot be emitted
    * when the purchase arrives (a qualifying click may still be in
    * flight): Spark buffers the unmatched purchase and emits the null
    * row only once the click-side watermark passes p_ts, PROVING no
    * match can arrive — that watermark proof is what makes outer
    * results exactly-once in append mode, and it means outer rows
    * trail the inner ones by up to the watermark delay. State stays
    * bounded exactly as in the inner form. The same body runs on batch
    * frames as a plain left join (withWatermark is a no-op);
    * stream==batch parity incl. a never-matched key is locked in
    * StreamingSpec, and the batch twin is oracle-gated as q136. */
  def purchasesWithClicks(events: DataFrame): DataFrame = {
    val (clicks, purchases) = clickPurchaseSides(events)
    purchases.join(clicks, clickPurchaseCond, "left_outer")
      .select(col("p_user").as("user_id"), col("p_event"), col("c_event"))
  }

  /** Shared sides of the click/purchase interval joins — one
    * definition so the inner (q107) and left-outer (q136) variants
    * cannot drift in watermark or predicate. */
  private def clickPurchaseSides(
      events: DataFrame): (DataFrame, DataFrame) = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_event"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_event"))
      .withWatermark("p_ts", "1 hour")
    (clicks, purchases)
  }

  private def clickPurchaseCond: org.apache.spark.sql.Column =
    col("c_user") === col("p_user") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")

  /** Streaming dedup on event_id within the watermark. */
  def dedupped(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Launch the transform into a fault-tolerant PARQUET file sink with
    * checkpointing — the production shape [[runToMemory]] only mimics.
    * File sinks are append-only, so windowed aggregates need the
    * watermark: each window is emitted exactly once, when the watermark
    * passes its end. The checkpoint holds source offsets (which input
    * files are consumed) + the aggregation state store, so killing the
    * query and restarting with the same (outDir, checkpointDir) resumes
    * exactly where it stopped — no lost and no duplicated windows
    * (kill/restart asserted in StreamingSpec). At scale the checkpoint
    * lives on the cluster FS and the sink's _spark_metadata log is what
    * makes concurrent readers see only committed files. */
  def runToParquet(
      spark: SparkSession, sourceDir: String, outDir: String,
      checkpointDir: String, transform: DataFrame => DataFrame,
      watermark: (String, String) = "ts" -> "1 hour"): StreamingQuery = {
    val src = spark.readStream
      .schema(eventsSchema)
      .parquet(sourceDir)
      .withWatermark(watermark._1, watermark._2)
    transform(src).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }

  /** Keyed UPSERT sink via foreachBatch — the merge pattern for sinks
    * without a transactional table format: an update-mode aggregate
    * streams per-key rows, and each micro-batch is merged into the
    * keyed parquet table last-writer-wins (anti-join out the incoming
    * keys, union the fresh rows). foreachBatch is at-least-once on
    * side effects; the merge is IDEMPOTENT (replaying a batch rewrites
    * the same rows), so kill/restart from the checkpoint converges to
    * exactly-once table contents — asserted in StreamingSpec. The
    * merged frame is eagerly materialized (localCheckpoint) before the
    * overwrite so the write never races its own input scan. At scale
    * the table would be key-partitioned and the merge a partition
    * overwrite (replaceWhere) instead of a full rewrite. */
  def runUpsert(
      spark: SparkSession, sourceDir: String, tableDir: String,
      checkpointDir: String, keyCol: String = "user_id"): StreamingQuery = {
    val src = spark.readStream
      .schema(eventsSchema)
      .parquet(sourceDir)
      .withWatermark("ts", "1 hour")
    val perKey = src.groupBy(keyCol)
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
    perKey.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val table = new java.io.File(tableDir)
        val merged =
          if (!table.exists()) batch
          else spark.read.parquet(tableDir)
            .join(batch.select(keyCol), Seq(keyCol), "left_anti")
            .unionByName(batch)
        val out = merged.localCheckpoint(true)
        out.write.mode("overwrite").parquet(tableDir)
        out.unpersist()
        ()
      }
      .start()
  }

  /** Launch a streaming query over a parquet directory into a memory
    * sink; caller drives it with processAllAvailable() (the local test
    * harness — a production sink would be kafka/delta/parquet). */
  def runToMemory(
      spark: SparkSession, parquetDir: String, queryName: String,
      transform: DataFrame => DataFrame,
      watermark: Option[(String, String)] = Some("ts" -> "1 hour"),
      outputMode: String = "complete"): StreamingQuery = {
    val raw = spark.readStream
      .schema(eventsSchema)
      .parquet(parquetDir)
    val src = watermark.fold(raw) { case (c, d) => raw.withWatermark(c, d) }
    transform(src).writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .start()
  }
}
