package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Count-min sketch as a mergeable typed Aggregator (Cormode &
  * Muthukrishnan 2005): a depth×width counter grid; each item
  * increments one counter per row (pairwise-independent hash per
  * row), point queries take the MINIMUM across rows — estimates are
  * always OVER-estimates, with error ≤ εN (ε = e/width) at
  * probability 1−δ (δ = e^−depth). The streaming/distributed
  * frequency-table primitive that complements [[MisraGries]]: MG
  * returns the candidate SET with no counts; CMS returns a COUNT for
  * any queried item, and the two compose into "candidates from MG,
  * counted by CMS, exact-confirmed by one hash-agg over just the
  * candidates" — no full frequency table ever materializes.
  *
  * Merge is element-wise addition — the buffer is a flat
  * `Array[Long]` of depth·width counters, so partial aggregation
  * runs map-side like any hash-agg and the shuffled state is KBs
  * regardless of corpus size (the mergeability contract every
  * sketch in `Sketches.scala` follows).
  *
  * Hashing: Kirsch–Mitzenmacher double hashing off two xxhash64-
  * style mixes of the UTF-8 bytes (the [[graft.operators.Dedup]]
  * minhash discipline) — deterministic, no RNG, identical across
  * partitionings and reruns.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 8, s"width >= 8, got $width")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], v: String): Array[Long] = {
    if (v != null) {
      var r = 0
      while (r < depth) {
        buf(r * width + CountMinSketch.cell(v, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {

  /** Deterministic 64-bit mix of a string (FNV-1a over UTF-8 then a
    * splitmix64 finalizer — public-domain constructions). */
  private[functions] def mix(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalize
    h ^= h >>> 30; h *= 0xbf58476d1ce4e5b9L
    h ^= h >>> 27; h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** Kirsch–Mitzenmacher: cell for row r = (h1 + r·h2) mod width. */
  private[functions] def cell(v: String, r: Int, width: Int): Int = {
    val h1 = mix(v, 0x9e3779b97f4a7c15L)
    val h2 = mix(v, 0x2545f4914f6cdd1dL) | 1L // odd, never degenerate
    (((h1 + r.toLong * h2) % width + width) % width).toInt
  }

  /** Point-query an aggregated sketch (the driver-side read path —
    * the sketch itself is a few KB). */
  def estimate(sketch: Array[Long], depth: Int, width: Int,
      v: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + cell(v, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Column API: aggregate a string column into a CMS buffer. */
  def cms_sketch(c: Column, depth: Int, width: Int): Column =
    udaf(new CountMinSketch(depth, width),
      Encoders.STRING).apply(c)
}
