package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation (the Aggregator[IN, BUF, OUT] surface —
  * SURVEY §7.3's "custom TypedImperativeAggregate" family): exact
  * bounded top-k of a Double column as a single aggregate.
  *
  * Why an aggregate instead of sort+limit: per GROUP top-k via
  * `orderBy.limit` needs a window (full sort of every partition);
  * this aggregator keeps a k-element buffer per group with map-side
  * partial aggregation — state is O(k) regardless of group size, and
  * the merge is associative/commutative, so the result is
  * deterministic under any partitioning (unlike order-dependent
  * sketches). Output is the descending-sorted top k values.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Double, List[Double], Seq[Double]] {

  override def zero: List[Double] = Nil

  private def trim(xs: List[Double]): List[Double] =
    if (xs.size <= k) xs else xs.sorted(Ordering[Double].reverse).take(k)

  override def reduce(buf: List[Double], v: Double): List[Double] =
    trim(v :: buf)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    trim(a ::: b)

  override def finish(buf: List[Double]): Seq[Double] =
    buf.sorted(Ordering[Double].reverse).take(k)

  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopKAggregator {
  import org.apache.spark.sql.functions.udaf

  /** Column form: `top_k(col)` → ARRAY<DOUBLE> of the k largest. */
  def top_k(c: Column, k: Int): Column = udaf(
    new TopKAggregator(k),
    org.apache.spark.sql.Encoders.scalaDouble).apply(c)
}
