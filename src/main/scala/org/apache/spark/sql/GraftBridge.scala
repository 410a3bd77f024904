package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's package-private Column factory, the
  * standard technique extension libraries use to expose custom Catalyst
  * `Expression`s through the public Column API (the public alternative,
  * `call_function`, requires per-session registry mutation).
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Convert a Column into a real (analyzable) expression TREE rather
    * than the lazy `ColumnNodeExpression` wrapper `expression` gives:
    * required when a Column COMPOSITION becomes the body of a
    * registered SQL function — the analyzer resolves the converted
    * `UnresolvedFunction` nodes, but never looks inside the wrapper. */
  def expressionTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a (custom) logical plan as a DataFrame — the package-private
    * `Dataset.ofRows` factory every Spark connector/extension uses to
    * surface its own `LogicalPlan` nodes through the public API. */
  def ofRows(
      spark: SparkSession,
      plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Analyzed logical plan of a frame (resolved attributes). */
  def analyzed(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
