package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators (Apache DataSketches HLL, built into
  * Spark's `hll_sketch_agg`/`hll_union_agg`): the 100 TB pattern where
  * per-partition sketches are materialized ONCE as a tiny "sketch
  * table" and every later rollup (day → week → all-time, per-key →
  * global) merges kilobyte sketches instead of rescanning the fact
  * table. Estimates carry no cross-engine oracle (DataSketches
  * internals), so the correctness gate is rows-only here; exactness
  * bounds are asserted in SketchSpec against countDistinct.
  */
object Sketches {

  /** The materializable sketch table: one HLL(user_id) sketch per
    * (event_type, day) — a few KB per row regardless of event volume.
    * lgK=12 → ~1.6% relative standard error. */
  def dailyUserSketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("sketch"),
        count(lit(1)).as("n_events"))

  /** Q78 — sketch rollup: per-key distinct-user totals by MERGING the
    * per-day sketches (no second scan of events), next to the naive
    * sum of daily estimates — the gap between the two columns is the
    * cross-day repeat-visitor mass, which only a mergeable sketch can
    * recover from pre-aggregated state. */
  def q78(t: Tables): DataFrame =
    dailyUserSketches(t.events)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(hll_sketch_estimate(col("sketch"))).as("sum_daily"),
        hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
          .as("merged_users"))
      .select(col("event_type"), col("n_days"), col("sum_daily"),
        col("merged_users"))
      .orderBy("event_type")

  /** The histogram "sketch table": per (event_type, day, bin) counts
    * over fixed equi-width bins fenced by the per-type min/max — the
    * DETERMINISTIC mergeable-quantile structure: merging two sketches
    * is vector addition of counts, and a quantile read off merged bins
    * is wrong by at most one bin width. Unlike HLL/KLL it carries no
    * randomness, so a cross-engine oracle can reproduce it bit-for-bit.
    * Fences are a tiny per-type frame (broadcast); the sketch build is
    * one map-side pass + one hash aggregate over ≤ |types|·days·bins
    * keys. */
  def dailyValueHistograms(
      events: DataFrame, bins: Int = 32): DataFrame = {
    val nn = events.filter(col("value").isNotNull)
    val fences = nn.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val w = (col("hi") - col("lo")) / bins
    // degenerate fence (all values equal -> width 0): everything is
    // bin 0 by definition; without the guard Spark's null-on-/0 path
    // and DuckDB's inf path diverge
    val bin = when(col("hi") === col("lo"), lit(0))
      .otherwise(least(lit(bins - 1),
        floor((col("value") - col("lo")) / w).cast("int")))
    nn.join(broadcast(fences), "event_type")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        bin.as("bin"), col("lo"), col("hi"))
      .groupBy("event_type", "day", "bin", "lo", "hi")
      .agg(count(lit(1)).as("cnt"))
  }

  /** q104 — quantile rollup OFF THE SKETCH TABLE: merge the per-day
    * histograms (plain sum — no rescan of events) and read approximate
    * p50/p90 as the lower edge of the covering bin. Companion to q78's
    * HLL rollup: together they give distinct-count AND quantile
    * answers from pre-aggregated kilobyte state, the shape that turns
    * a 100 TB fact table into an interactively queryable summary.
    * Error is bounded by one bin width (asserted in SketchSpec); the
    * arithmetic is deterministic, so unlike q78 this one carries a
    * full hash-match oracle. */
  def q104(t: Tables, bins: Int = 32): DataFrame = {
    val merged = dailyValueHistograms(t.events, bins)
      .groupBy("event_type", "bin", "lo", "hi")
      .agg(sum("cnt").as("cnt"))
    val wv = Window.partitionBy("event_type").orderBy("bin")
    val cum = merged
      .withColumn("n", sum("cnt").over(
        Window.partitionBy("event_type")))
      .withColumn("cum", sum("cnt").over(
        wv.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bin width uses the SAME bins value the sketch was built with
    def edge(p: Double) = min(when(
      col("cum") >= ceil(col("n") * p),
      col("lo") + (col("hi") - col("lo")) / bins * col("bin")))
    cum.groupBy("event_type")
      .agg(max("n").as("n"),
        round(edge(0.5), 4).as("p50_bin_edge"),
        round(edge(0.9), 4).as("p90_bin_edge"),
        count(lit(1)).as("bins_used"))
      .orderBy("event_type")
  }
}
