package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive theta join") {
    val tol = 7L * 24 * 3600
    val bucketed = RangeJoin.withinToleranceCount(
      tables.orders, tables.orders, "o_orderdate", "o_orderkey", tol)
    val a = tables.orders.select(col("o_orderkey").as("l_id"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("l_t"))
    val b = tables.orders.select(col("o_orderkey").as("r_id"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("r_t"))
    val naive = a.crossJoin(b)
      .filter(abs(col("l_t") - col("r_t")) <= tol * 1000000L
        && col("l_id") =!= col("r_id"))
      .groupBy("l_id").agg(count(lit(1)).as("nearby"))
    assert(bucketed.exceptAll(naive).count() == 0
      && naive.exceptAll(bucketed).count() == 0)
  }

  test("range-count-by-day equals the pair-enumerating form") {
    val tol = 7L * 24 * 3600
    val pairs = RangeJoin.withinToleranceCount(
      tables.orders, tables.orders, "o_orderdate", "o_orderkey", tol)
      .select(col("l_id").as("o_orderkey"), col("nearby"))
    val hist = RangeJoin.rangeCountByDay(
      tables.orders, "o_orderdate", "o_orderkey", 7)
      .filter(col("nearby") > 0) // pair form omits zero-neighbor rows
    assert(hist.exceptAll(pairs).count() == 0
      && pairs.exceptAll(hist).count() == 0)
  }

  test("range-count-by-day refuses an oversized histogram") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeCountByDay(
        tables.orders, "o_orderdate", "o_orderkey", 7, maxHistRows = 10L)
    }
    assert(e.getMessage.contains("buckets"))
  }

  test("no self pairs and counts are symmetric in total") {
    val tol = 3600L
    val r = RangeJoin.withinToleranceCount(
      tables.events, tables.events, "ts", "event_id", tol)
    // total directed pair count must be even (each pair counted twice)
    val total = r.agg(sum("nearby")).collect()(0).getLong(0)
    assert(total % 2 == 0)
  }
}
