package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches,
  Union, UpdateSketch}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Mergeable Theta sketch (Dasgupta et al., the KMV/theta unique-count
  * family) over LONG keys — the SET-EXPRESSION member of the sketch
  * suite: unlike HLL (union-only), theta sketches support INTERSECTION
  * and A-NOT-B on the compact form, so segment-overlap questions
  * ("users who did A and B", "A but never B") are answered from
  * kilobyte per-segment state without rescanning — at 100 TB the
  * alternative is a distinct self-join per segment PAIR, a quadratic
  * family of shuffles over the fact table.
  *
  * Same execution discipline as [[QuantileSketch]]: live heap sketch
  * per partition buffer, blobs only at stage boundaries, persisted
  * "sketch table" rows re-combinable forever. Randomized (hash
  * sampling at theta < 1) → rows-only gate; SketchSpec pins estimate
  * error and set-algebra consistency against exact distinct joins.
  */
object ThetaSketch {

  class State extends Serializable {
    @transient var sketch: UpdateSketch = _
    @transient var union: Union = _
    // Configured nominal entries, carried ACROSS the Java-serialization
    // boundary between partial and final aggregation: rehydrating the
    // union with the library default (4096) would silently cap any
    // theta_agg(..., nomEntries > 4096) after the shuffle, breaking
    // exact-mode equality and making results partitioning-dependent.
    private var nom: Int = 0
    def ensure(nomEntries: Int): UpdateSketch = {
      nom = nomEntries
      if (sketch == null)
        sketch = UpdateSketch.builder()
          .setNominalEntries(nomEntries).build()
      sketch
    }
    /** Union accumulator for merge-side state (blob inputs). */
    def ensureUnion(nomEntries: Int): Union = {
      nom = nomEntries
      if (union == null)
        union = SetOperation.builder()
          .setNominalEntries(nomEntries).buildUnion()
      union
    }
    def result(nomEntries: Int): Sketch = {
      if (union != null) {
        if (sketch != null) union.union(sketch.compact())
        union.getResult
      } else ensure(nomEntries).compact()
    }
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b =
        if (union != null) {
          if (sketch != null) union.union(sketch.compact())
          union.getResult.toByteArray
        } else if (sketch != null) sketch.compact().toByteArray
        else Array.empty[Byte]
      out.writeInt(nom)
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      nom = in.readInt()
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      if (n > 0) {
        // rehydrate into a union at the CONFIGURED nominal entries so
        // further merges keep accumulating at full resolution
        val builder = SetOperation.builder()
        if (nom > 0) builder.setNominalEntries(nom)
        union = builder.buildUnion()
        union.union(Sketches.wrapSketch(Memory.wrap(b)))
      }
    }
  }

  class BuildAggregator(nomEntries: Int)
      extends Aggregator[Long, State, Array[Byte]] {
    override def zero: State = new State
    override def reduce(b: State, v: Long): State = {
      b.ensure(nomEntries).update(v); b
    }
    override def merge(a: State, b: State): State = {
      val u = a.ensureUnion(nomEntries)
      if (b.sketch != null) u.union(b.sketch.compact())
      if (b.union != null) u.union(b.union.getResult)
      a
    }
    override def finish(b: State): Array[Byte] =
      b.result(nomEntries).toByteArray
    override def bufferEncoder: Encoder[State] =
      Encoders.javaSerialization[State]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def theta_agg(value: Column, nomEntries: Int = 4096): Column =
    udaf(new BuildAggregator(nomEntries), Encoders.scalaLong)(value)

  // ---- driver/sketch-table-side set algebra (blobs are KBs) --------

  def estimate(blob: Array[Byte]): Double =
    if (blob == null || blob.isEmpty) 0.0
    else Sketches.wrapSketch(Memory.wrap(blob)).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapSketch(Memory.wrap(a)))
    i.intersect(Sketches.wrapSketch(Memory.wrap(b)))
    i.getResult.getEstimate
  }

  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double =
    SetOperation.builder().buildANotB()
      .aNotB(
        Sketches.wrapSketch(Memory.wrap(a)),
        Sketches.wrapSketch(Memory.wrap(b)))
      .getEstimate

  /** UDF surfaces for sketch-table queries (q78's estimate position —
    * they run over a handful of sketch rows, never the fact table). */
  def estimateUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) => estimate(b))

  def intersectUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (a: Array[Byte], b: Array[Byte]) => intersectEstimate(a, b))

  def aNotBUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf(
      (a: Array[Byte], b: Array[Byte]) => aNotBEstimate(a, b))
}
