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
}
