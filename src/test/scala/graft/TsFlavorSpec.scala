package graft

import org.apache.spark.sql.{AnalysisException, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-drift armor: the driver-generated `events.ts` has shipped as
  * parquet TIMESTAMP(NANOS), TIMESTAMP(MICROS, adjusted) and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) across rounds. The last
  * flavor is what pandas/pyarrow writes by default and what Spark 4
  * infers as TIMESTAMP_NTZ — which every `unix_micros(ts)` call site
  * rejects at analysis. `Tables.load` must normalize ALL flavors to
  * session-zoned TIMESTAMP so a regenerated fixture can never break
  * the ts-dependent queries again (round-6 regression: q15/q72/q117).
  */
class TsFlavorSpec extends SparkSpec {
  import spark.implicits._

  // 2026-01-01T00:00:00Z, in micros
  private val base = 1767225600000000L
  private val min = 60L * 1000000L

  // user 1: events at +0, +10m, +20m, then a 60m gap (> 30m ⇒ new
  // session), +80m, +90m, +100m → 2 sessions, 6 events
  private val microTs =
    Seq(0L, 10 * min, 20 * min, 80 * min, 90 * min, 100 * min)
      .map(base + _)

  private def writeFlavor(flavor: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft-tsflavor-$flavor").toString
    val raw = microTs.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 1L) }
      .toDF("event_id", "ts_us", "user_id")
    val df = flavor match {
      case "long_nanos" =>
        raw.select(col("event_id"), (col("ts_us") * 1000L).as("ts"),
          col("user_id"))
      case "timestamp" =>
        raw.select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("user_id"))
      case "timestamp_ntz" =>
        raw.select(col("event_id"),
          timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
          col("user_id"))
    }
    df.write.parquet(Tables.path(dir, "events"))
    dir
  }

  private def q15Sessions(dir: String): Seq[(Long, Long, Long)] = {
    val got = graft.operators.Relational.q15(Tables(spark, dir))
    got.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  for (flavor <- Seq("long_nanos", "timestamp", "timestamp_ntz"))
    test(s"Tables.load normalizes ts flavor '$flavor' and q15 analyzes") {
      val dir = writeFlavor(flavor)
      val events = Tables(spark, dir).events
      assert(events.schema("ts").dataType == TimestampType,
        s"$flavor: expected TIMESTAMP after load, got " +
          events.schema("ts").dataType)
      assert(q15Sessions(dir) == Seq((1L, 2L, 6L)), flavor)
    }

  test("normalizeTs casts a TIMESTAMP_NTZ frame that bypassed the conf") {
    val ntz = microTs.map(t => Tuple1(t)).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fixed = Tables.normalizeTs(ntz)
    assert(fixed.schema("ts").dataType == TimestampType)
    // UTC session ⇒ the cast is value-preserving
    assert(fixed.select(unix_micros(col("ts"))).as[Long].collect().toSeq
      == microTs)
  }

  test("negative: an un-normalized NTZ scan fails unix_micros analysis " +
    "(the round-6 fixture regression, reproduced deliberately)") {
    val dir = writeFlavor("timestamp_ntz")
    val prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val raw = spark.read.parquet(Tables.path(dir, "events"))
      assert(raw.schema("ts").dataType == TimestampNTZType,
        "fixture should read back as NTZ when inference is on")
      intercept[AnalysisException] {
        raw.select(unix_micros(col("ts"))).collect()
      }
    } finally
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
  }
}
