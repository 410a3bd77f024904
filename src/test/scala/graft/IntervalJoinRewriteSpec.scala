package graft

import graft.plans.IntervalJoinRewrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The interval-join rewrite must change the PLAN (equi-keyless theta
  * join → bucketed equi-join, no nested loop) without changing the
  * RESULT (the original predicate is kept as a filter). */
class IntervalJoinRewriteSpec extends SparkSpec {

  private def epochs(alias: String): DataFrame =
    tables.events.select(
      col("event_id").as(s"${alias}_id"),
      unix_micros(col("ts")).as(s"${alias}_t"))

  private val tol = 3600L * 1000000L // 1 hour in micros

  private def thetaJoin(): DataFrame =
    epochs("a").join(epochs("b"),
      abs(col("a_t") - col("b_t")) <= tol && col("a_id") =!= col("b_id"))

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ IntervalJoinRewrite
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == IntervalJoinRewrite)
  }

  test("rewrites the theta join into an equi-join plan (no nested loop)") {
    val before = thetaJoin().queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"), before)
    withRule {
      val after = thetaJoin().queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin"), after)
      assert(!after.contains("CartesianProduct"), after)
      assert(after.contains("SortMergeJoin")
        || after.contains("ShuffledHashJoin")
        || after.contains("BroadcastHashJoin"), after)
    }
  }

  test("rewritten join is bit-identical to the nested-loop result") {
    val naive = thetaJoin().collect().map(_.toString).sorted.toSeq
    val rewritten = withRule { thetaJoin().collect() }
      .map(_.toString).sorted.toSeq
    assert(rewritten == naive)
  }

  test("agrees with the hand-bucketed RangeJoin operator") {
    val viaRule = withRule {
      thetaJoin().groupBy(col("a_id").as("l_id"))
        .agg(count(lit(1)).as("nearby")).collect()
    }.map(_.toString).sorted.toSeq
    val viaOperator = graft.operators.RangeJoin.withinToleranceCount(
      tables.events, tables.events, "ts", "event_id", 3600L)
      .collect().map(_.toString).sorted.toSeq
    assert(viaRule == viaOperator)
  }

  test("joins that already have an equi key are left untouched") {
    val planWithRule = withRule {
      epochs("a").join(epochs("b"),
        col("a_id") === col("b_id") && abs(col("a_t") - col("b_t")) <= tol)
        .queryExecution.optimizedPlan.toString
    }
    // no bucket machinery injected: the equi key already plans fine
    assert(!planWithRule.contains("__ij_bucket"), planWithRule)
    assert(!planWithRule.contains("explode"), planWithRule)
  }
}
