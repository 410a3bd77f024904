package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues}

/** Streaming Misra–Gries heavy hitters — the online half of q90's
  * two-pass pattern (SURVEY §2.9): a `transformWithState` processor
  * maintains a bounded `capacity`-counter MG sketch PER HASH BUCKET in
  * the (RocksDB-backed) state store, so "what's trending in the crawl
  * right now" is answerable continuously without re-scanning history.
  * The batch twin ([[graft.functions.MisraGries]]) proves candidates
  * then q90 recounts them exactly; this is the same contract kept live
  * across micro-batches: the emitted set per bucket is a GUARANTEED
  * superset of every token whose true count exceeds
  * n_bucket / capacity (and since n_bucket ≤ N, of every global
  * > N / capacity hitter in that bucket), with decremented
  * lower-bound counts that never exceed the truth.
  *
  * Scale posture: tokens shard by `xxhash64(token) % buckets`, so the
  * stateful shuffle spreads across `buckets` keys (pick buckets ≈
  * executor count; ONE key would funnel the stream through one task —
  * the hazard class PlanAudit flags in batch plans). State is ≤
  * capacity entries per bucket — fixed bytes regardless of stream
  * length, exactly like the ledger-family sketches. Candidate sets
  * are order-dependent (the MG property); the invariant part — the
  * superset guarantee and the lower bounds — is what StreamingSpec
  * pins, on the batch path AND across multi-file micro-batches.
  */
object TwsHeavyHitters {

  final case class Tok(bucket: Long, token: String)

  /** One candidate row: the bucket's tokens-seen counter (`seen`)
    * makes the LAST emission per bucket identifiable in an
    * append-style sink — rows with the bucket's max `seen` are its
    * final state. */
  final case class Cand(bucket: Long, token: String, lb: Long, seen: Long)

  class MgProcessor(capacity: Int)
      extends StatefulProcessor[Long, Tok, Cand] {
    @transient private var counters: MapState[String, Long] = _
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long](
        "mg", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      // single-entry map used as a per-key scalar (one state handle
      // type keeps the store layout uniform)
      seen = getHandle.getMapState[String, Long](
        "seen", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[Cand] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      counters.iterator().foreach { case (k, v) => m(k) = v }
      var n = if (seen.containsKey("n")) seen.getValue("n") else 0L
      rows.foreach { t =>
        n += 1L
        m.get(t.token) match {
          case Some(c) => m(t.token) = c + 1L
          case None if m.size < capacity => m(t.token) = 1L
          case None =>
            // decrement-all by the smallest count (the batched MG
            // overflow step, mirroring the batch aggregator's reduce)
            m(t.token) = 1L
            val cut = m.values.min
            m.keys.toSeq.foreach { k =>
              val nc = m(k) - cut
              if (nc > 0L) m(k) = nc else m.remove(k)
            }
        }
      }
      counters.clear()
      m.foreach { case (k, v) => counters.updateValue(k, v) }
      seen.updateValue("n", n)
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => Cand(key, k, v, n) }.iterator
    }
  }

  /** Maintain MG candidates over a token frame (any DataFrame with a
    * `token` string column). Same body for batch Datasets (state
    * evaluated once per bucket) and streaming ones (state carried
    * across micro-batches). */
  def heavyHitterCandidates(
      spark: SparkSession, tokens: Dataset[_],
      capacity: Int = 50, buckets: Int = 8): Dataset[Cand] = {
    import spark.implicits._
    tokens.toDF()
      .select(
        pmod(xxhash64(col("token")), lit(buckets)).cast("long")
          .as("bucket"),
        col("token"))
      .as[Tok]
      .groupByKey(_.bucket)
      .transformWithState(
        new MgProcessor(capacity), TimeMode.None(), OutputMode.Update())
  }
}
