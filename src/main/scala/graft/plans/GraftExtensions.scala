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
  * Custom `Rule[LogicalPlan]` / `SparkStrategy`: deliberately none.
  * Every reference operator maps to built-in Catalyst operators whose
  * optimizer rules (pushdown, pruning, join selection, AQE) already
  * produce the plans we want (SURVEY §4.2/§7.3) — plan-shape evidence
  * is recorded in BASELINE.md. The extension point is where a
  * benchmark-driven rule (e.g. collapsing an N-way outer-join chain
  * into union+pivot) would be injected; the engine instead exposes the
  * union+pivot form directly as API ([[graft.ml.Ranker.scoreMatrix]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VectorDot(args(0), args(1))))

  /** Register the engine functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
