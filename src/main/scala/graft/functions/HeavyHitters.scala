package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items candidate aggregator: bounded state of
  * `capacity` counters per aggregation buffer regardless of input
  * volume. The classical guarantee survives partial aggregation and
  * merge (counter subtraction is associative enough to preserve it):
  * every item with true frequency > n/capacity is GUARANTEED to be in
  * the output candidate set. Candidate counts are NOT exact and the
  * set depends on merge order — so the engine uses this purely as a
  * pruning pass and re-counts candidates exactly (see
  * `TextAnalysis.heavyHitters`): bounded-state scan + tiny exact
  * confirm, the standard two-pass heavy-hitters pattern, with a fully
  * deterministic (and therefore oracle-checkable) final output.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  private def decrementAll(m: Map[String, Long], by: Long)
      : Map[String, Long] =
    m.flatMap { case (k, c) =>
      if (c > by) Some(k -> (c - by)) else None
    }

  override def reduce(buf: Map[String, Long], v: String)
      : Map[String, Long] = {
    val updated = buf.updated(v, buf.getOrElse(v, 0L) + 1L)
    if (updated.size <= capacity) updated
    // no free slot: decrement every counter by the smallest count —
    // the batched form of MG's decrement-all-on-overflow
    else decrementAll(updated, updated.values.min)
  }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else {
      // keep the capacity largest, subtract the (capacity+1)-th count
      val sorted = combined.toSeq.sortBy { case (k, c) => (-c, k) }
      val cut = sorted(capacity)._2
      decrementAll(sorted.take(capacity).toMap, cut)
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  import org.apache.spark.sql.functions.udaf

  /** Column form: candidate heavy-hitter items (superset of every item
    * with frequency > n/capacity). */
  def mg_candidates(c: Column, capacity: Int): Column = udaf(
    new MisraGries(capacity),
    org.apache.spark.sql.Encoders.STRING).apply(c)
}
