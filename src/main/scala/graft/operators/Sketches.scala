package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
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
}
