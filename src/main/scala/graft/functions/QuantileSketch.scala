package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions.udaf

/** Mergeable KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16) over
  * DOUBLE values — the randomized member of the quantile family next
  * to q104's deterministic fixed-bin histograms: ~2 KB of state at
  * k=200 gives ±1.65% worst-case rank error at any quantile, with no
  * fences to pre-compute and no resolution floor from a bin width.
  *
  * Execution shape: the buffer is a LIVE heap sketch per partition —
  * `Aggregator` buffers stay JVM objects through the partial
  * aggregate and only cross the wire via the encoder, so the fact
  * scan pays one `update(double)` per row and the shuffle carries one
  * ~2 KB blob per (group, partition). Java-serialization hooks
  * delegate to the DataSketches binary form (`toByteArray`/
  * `heapify`), which is also the at-rest "sketch table" format —
  * [[KllMergeAggregator]] re-aggregates persisted blobs without
  * rescanning the fact table (the q78 HLL rollup discipline).
  *
  * KLL compaction draws random offsets → estimates are not
  * bit-reproducible across runs, so queries over these are rows-only;
  * SketchSpec pins rank error against the exact two-pass
  * `quantileCont` and proves merged-vs-whole equivalence bounds.
  */
object QuantileSketch {

  /** Serializable live-sketch holder. `k` rides the blob (DataSketches
    * header), so deserialized state can't diverge from build-side
    * geometry. */
  class State extends Serializable {
    @transient var sketch: KllDoublesSketch = _
    def ensure(k: Int): KllDoublesSketch = {
      if (sketch == null) sketch = KllDoublesSketch.newHeapInstance(k)
      sketch
    }
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = if (sketch == null) Array.empty[Byte] else sketch.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      if (n > 0) sketch = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** value → sketch blob. Nulls must be filtered upstream (same
    * contract as the bloom/count-min aggregators). */
  class BuildAggregator(k: Int)
      extends Aggregator[Double, State, Array[Byte]] {
    override def zero: State = new State
    override def reduce(b: State, v: Double): State = {
      b.ensure(k).update(v); b
    }
    override def merge(a: State, b: State): State = {
      if (b.sketch != null) a.ensure(k).merge(b.sketch)
      a
    }
    override def finish(b: State): Array[Byte] = b.ensure(k).toByteArray
    override def bufferEncoder: Encoder[State] =
      Encoders.javaSerialization[State]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** blob → merged blob: the rollup aggregator that never rescans the
    * fact table. */
  class MergeAggregator(k: Int)
      extends Aggregator[Array[Byte], State, Array[Byte]] {
    override def zero: State = new State
    override def reduce(b: State, blob: Array[Byte]): State = {
      if (blob != null && blob.nonEmpty)
        b.ensure(k).merge(KllDoublesSketch.heapify(Memory.wrap(blob)))
      b
    }
    override def merge(a: State, b: State): State = {
      if (b.sketch != null) a.ensure(k).merge(b.sketch)
      a
    }
    override def finish(b: State): Array[Byte] = b.ensure(k).toByteArray
    override def bufferEncoder: Encoder[State] =
      Encoders.javaSerialization[State]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column-API surfaces. */
  def kll_agg(value: Column, k: Int = 200): Column =
    udaf(new BuildAggregator(k), Encoders.scalaDouble)(value)

  def kll_merge_agg(blob: Column, k: Int = 200): Column =
    udaf(new MergeAggregator(k), Encoders.BINARY)(blob)

  /** Quantile read-off — runs over the tiny sketch TABLE (a few rows),
    * not the fact table, so a plain Scala UDF is the right tool (the
    * hll_sketch_estimate position in the q78 rollup). Inclusive rank
    * semantics to match `quantile_cont`'s step positions as closely as
    * a rank sketch can. */
  def kllQuantilesUdf: org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udf {
      (blob: Array[Byte], ps: Seq[Double]) =>
        if (blob == null || blob.isEmpty) null
        else {
          val sk = KllDoublesSketch.heapify(Memory.wrap(blob))
          if (sk.isEmpty) null
          else ps.map(p => sk.getQuantile(p,
            org.apache.datasketches.quantilescommon
              .QuantileSearchCriteria.INCLUSIVE)).toArray
        }
    }

  def kllNUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (blob: Array[Byte]) =>
      if (blob == null || blob.isEmpty) 0L
      else KllDoublesSketch.heapify(Memory.wrap(blob)).getN
    }

  /** Two-sample Kolmogorov–Smirnov distance from two KLL sketches:
    * D̂ = max over a candidate grid of |F_a(x) − F_b(x)|, the grid
    * being both sketches' quantiles at `grid` evenly spaced ranks
    * (the retained-item resolution — KLL's rank error ε bounds
    * |D̂ − D| ≤ 2ε). Sketch-table-side (two kilobyte blobs), never
    * the fact table. */
  def ksDistance(a: Array[Byte], b: Array[Byte],
      grid: Int = 512): Double = {
    import org.apache.datasketches.quantilescommon
      .QuantileSearchCriteria.INCLUSIVE
    if (a == null || a.isEmpty || b == null || b.isEmpty) return Double.NaN
    val sa = KllDoublesSketch.heapify(Memory.wrap(a))
    val sb = KllDoublesSketch.heapify(Memory.wrap(b))
    if (sa.isEmpty || sb.isEmpty) return Double.NaN
    val points = (0 to grid).flatMap { i =>
      val p = i.toDouble / grid
      Seq(sa.getQuantile(p, INCLUSIVE), sb.getQuantile(p, INCLUSIVE))
    }.distinct
    points.map(x => math.abs(
      sa.getRank(x, INCLUSIVE) - sb.getRank(x, INCLUSIVE))).max
  }

  def ksDistanceUdf: org.apache.spark.sql.expressions
      .UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (a: Array[Byte], b: Array[Byte]) => ksDistance(a, b))
}
