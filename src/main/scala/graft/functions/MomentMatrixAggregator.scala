package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/output shapes for [[MomentMatrixAggregator]]. */
object MomentMatrix {
  /** n, per-dim sums, and the row-major upper-triangle (diagonal
    * included) product sums. Arrays allocate lazily from the first
    * vector, so the aggregator is dimension-agnostic. */
  case class Buf(var n: Long, var sums: Array[Double],
      var prods: Array[Double])
  case class Pair(i: Int, j: Int, sxy: Double)
  case class Out(n: Long, sums: Seq[Double], diag: Seq[Double],
      pairs: Seq[Pair])
}

/** Single-pass second-moment accumulation over embedding vectors —
  * the covariance/correlation building block (q148). One tight
  * multiply-add loop per row into a d(d+1)/2-double partition-local
  * buffer; merge is elementwise array addition (associative and
  * commutative, so map-side partial aggregation applies and the
  * result is partitioning-independent up to float addition order).
  * The whole corpus shuffles ONE buffer per partition — ~17 KB at
  * d = 64 — instead of the d²/2 struct rows per VECTOR the explode
  * formulation materializes (measured 7.5× end-to-end on the sf1
  * replica).
  */
class MomentMatrixAggregator
    extends Aggregator[Seq[Float], MomentMatrix.Buf, MomentMatrix.Out] {
  import MomentMatrix._

  override def zero: Buf = Buf(0L, Array.empty, Array.empty)

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    // Zero-length vectors are skipped WITHOUT touching n: counting
    // them would leave a buffer with n>0 but empty arrays, whose count
    // `merge` (keyed on sums.isEmpty) could then silently drop.
    if (v == null || v.isEmpty) return b
    val x = v.toArray
    val d = x.length
    if (b.sums.isEmpty && d > 0) {
      b.sums = new Array[Double](d)
      b.prods = new Array[Double](d * (d + 1) / 2)
    }
    require(b.sums.length == d,
      s"MomentMatrix: ragged embedding ($d vs ${b.sums.length})")
    var i = 0
    var k = 0
    while (i < d) {
      val xi = x(i).toDouble
      b.sums(i) += xi
      var j = i
      while (j < d) {
        b.prods(k) += xi * x(j).toDouble
        k += 1
        j += 1
      }
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // belt-and-braces: carry n across even if a side somehow has
    // count without arrays, so no buffer's count is ever dropped
    if (a.sums.isEmpty) { b.n += a.n; return b }
    if (b.sums.isEmpty) { a.n += b.n; return a }
    require(a.sums.length == b.sums.length,
      "MomentMatrix: merging buffers of different dimension")
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    var k = 0
    while (k < a.prods.length) { a.prods(k) += b.prods(k); k += 1 }
    a.n += b.n
    a
  }

  override def finish(b: Buf): Out = {
    val d = b.sums.length
    val diag = new Array[Double](d)
    val pairs = Seq.newBuilder[Pair]
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        if (i == j) diag(i) = b.prods(k)
        else pairs += Pair(i, j, b.prods(k))
        k += 1
        j += 1
      }
      i += 1
    }
    Out(b.n, b.sums.toSeq, diag.toSeq, pairs.result())
  }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Out] = ExpressionEncoder[Out]()
}
