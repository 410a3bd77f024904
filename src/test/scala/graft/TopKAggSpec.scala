package graft

import graft.functions.TopKAggregator
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k equals sort-descending take-k per group") {
    val got = tables.lineitem
      .groupBy("l_returnflag")
      .agg(TopKAggregator.top_k(col("l_extendedprice"), 5).as("top5"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val expected = tables.lineitem
      .select("l_returnflag", "l_extendedprice")
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(_.getDouble(1)).sorted(Ordering[Double].reverse)
          .take(5).toSeq
      }
    expected.foreach { case (k, exp) => assert(got(k) == exp, s"group $k") }
  }

  test("top_k is stable under repartitioning (merge associativity)") {
    def run(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("event_type")
      .agg(TopKAggregator.top_k(col("value"), 7).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val a = run(tables.events)
    val b = run(tables.events.repartition(13))
    assert(a == b)
  }

  test("groups smaller than k return all values sorted") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 2.0)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(TopKAggregator.top_k(col("v"), 5).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(3.0, 1.0) && got("b") == Seq(2.0))
  }
}
