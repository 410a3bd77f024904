package graft.plans

import graft.functions.VectorDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the
  * native vector functions for SQL users
  * (`SELECT vec_dot(a, b) ...`). Enable with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`;
  * [[GraftExtensions.register]] does the same on a live session.
  *
  * Custom rules: exactly one, [[IntervalJoinRewrite]] — the only place
  * built-in Catalyst genuinely mis-plans a reference-relevant shape
  * (equi-keyless interval joins become BroadcastNestedLoopJoin).
  * Everything else maps to built-in operators whose optimizer rules
  * (pushdown, pruning, join selection, AQE) already produce the plans
  * we want (SURVEY §4.2/§7.3) — plan-shape evidence in BASELINE.md.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => IntervalJoinRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))

  /** Register the engine functions + planner strategy on an
    * already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
  }
}
