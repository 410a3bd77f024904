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

  // ---- KLL quantile sketches (q167) --------------------------------

  /** The KLL sketch table: one ~2 KB quantile sketch of `value` per
    * (event_type, day) — q104's histogram without the fence pre-pass
    * or the bin-width resolution floor. k=200 → ±1.65% rank error. */
  def dailyValueKllSketches(events: DataFrame, k: Int = 200): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.QuantileSketch
        .kll_agg(col("value").cast("double"), k).as("sketch"),
        count(lit(1)).as("n_values"))

  /** q167 — quantile rollup OFF THE KLL SKETCH TABLE: merge the
    * per-day sketches (never rescanning events) and read p50/p90/p99
    * per event type. Randomized compaction → rows-only gate;
    * SketchSpec pins rank error against the exact two-pass
    * quantileCont and merged-vs-whole agreement. */
  def q167(t: Tables, k: Int = 200): DataFrame = {
    import graft.functions.QuantileSketch.{kllNUdf, kllQuantilesUdf, kll_merge_agg}
    val merged = dailyValueKllSketches(t.events, k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum("n_values").as("n_values"),
        kll_merge_agg(col("sketch"), k).as("sk"))
    val qs = kllQuantilesUdf(col("sk"),
      typedlit(Seq(0.5, 0.9, 0.99))).as("qs")
    merged
      .select(col("event_type"), col("n_days"), col("n_values"),
        kllNUdf(col("sk")).as("sketch_n"), qs)
      .select(col("event_type"), col("n_days"), col("n_values"),
        col("sketch_n"),
        round(element_at(col("qs"), 1), 4).as("p50"),
        round(element_at(col("qs"), 2), 4).as("p90"),
        round(element_at(col("qs"), 3), 4).as("p99"))
      .orderBy("event_type")
  }

  // ---- segment overlap off theta sketches (q168) -------------------

  /** The theta sketch table: one compact theta sketch of user_id per
    * event type — unlike the q78 HLLs these support INTERSECTION and
    * A-NOT-B, so any segment-overlap expression is answerable from
    * kilobyte state. */
  def eventUserThetaSketches(
      events: DataFrame, nomEntries: Int = 4096): DataFrame =
    events
      .groupBy("event_type")
      .agg(graft.functions.ThetaSketch
        .theta_agg(col("user_id").cast("long"), nomEntries).as("sketch"),
        count(lit(1)).as("n_events"))

  /** q175 — daily new-vs-returning users OFF THE THETA SKETCH TABLE:
    * q88's growth-accounting question answered from per-day kilobyte
    * sketches — active(d) = |S_d|, new(d) = |S_d \ ∪_{i<d} S_i|
    * (A-not-B against the running union), returning = active − new.
    * HLL sketch tables (q78) cannot answer this: union-only merges
    * have no set difference. The fold runs DRIVER-SIDE over ≤|days|
    * compact sketches (bounded kilobytes — the sketch-table scale,
    * same discipline as the q83 centroid collect); the fact table is
    * scanned once to build the sketch table and never again, which is
    * the whole point at 100 TB: yesterday's sketches are immutable
    * state, today's increment appends one row. Randomized sampling →
    * rows-only gate; SketchSpec pins exact-mode equality against the
    * exact first-seen computation. */
  def q175(t: Tables, nomEntries: Int = 4096): DataFrame = {
    import graft.functions.ThetaSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches => DsSketches}
    val spark = t.events.sparkSession
    val daily = t.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(ThetaSketch.theta_agg(col("user_id").cast("long"),
        nomEntries).as("sketch"))
      .orderBy("day")
      .collect()
    val union = SetOperation.builder()
      .setNominalEntries(nomEntries).buildUnion()
    val rows = daily.map { r =>
      val day = r.getAs[java.sql.Date]("day")
      val blob = r.getAs[Array[Byte]]("sketch")
      val sk = DsSketches.wrapSketch(Memory.wrap(blob))
      val active = math.rint(sk.getEstimate * 10) / 10
      val fresh = math.rint(SetOperation.builder().buildANotB()
        .aNotB(sk, union.getResult).getEstimate * 10) / 10
      union.union(sk)
      (day, active, fresh, math.rint((active - fresh) * 10) / 10)
    }
    import spark.implicits._
    rows.toSeq
      .toDF("day", "est_active", "est_new", "est_returning")
      .orderBy("day")
  }

  /** q168 — q79's exact audience-overlap matrix OFF THE SKETCH TABLE:
    * pairwise intersection, A-not-B, and marginal estimates from
    * per-type theta sketches — answered from kilobyte state with no
    * fact-table rescan, where q79 pays a full scan + user_id shuffle
    * per refresh. The pair join is over the |types|-row sketch frame
    * (bounded, tiny — the 1-row-scalar-frame discipline). Randomized
    * hash sampling → rows-only gate; SketchSpec pins the estimates
    * against q79's exact counts (equality in exact mode, error bounds
    * in sampling mode). */
  def q168(t: Tables, nomEntries: Int = 4096): DataFrame = {
    import graft.functions.ThetaSketch.{aNotBUdf, estimateUdf, intersectUdf}
    val sk = eventUserThetaSketches(t.events, nomEntries)
    val a = sk.select(col("event_type").as("type_a"),
      col("sketch").as("sk_a"))
    val b = sk.select(col("event_type").as("type_b"),
      col("sketch").as("sk_b"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        round(estimateUdf(col("sk_a")), 1).as("est_a"),
        round(estimateUdf(col("sk_b")), 1).as("est_b"),
        round(intersectUdf(col("sk_a"), col("sk_b")), 1).as("est_both"),
        round(aNotBUdf(col("sk_a"), col("sk_b")), 1).as("est_a_only"))
      .orderBy("type_a", "type_b")
  }

  /** q179 — the q178 KS drift statistic read OFF THE KLL SKETCH
    * TABLE: the same half-range period split, but the two period
    * distributions come from merging the per-day sketches (kilobytes)
    * — the fact table is never rescanned, so the drift alarm runs
    * after every increment at sketch-table cost. |D̂ − D| ≤ 2ε (KLL
    * rank error, ~3.3% at k=200) — SketchSpec pins the bound against
    * [[Relational.ksDrift]]'s exact integers. Randomized compaction →
    * rows-only gate. */
  def q179(t: Tables, k: Int = 200): DataFrame = {
    import graft.functions.QuantileSketch.{kll_merge_agg, ksDistanceUdf}
    val table = dailyValueKllSketches(t.events, k)
    // day bounds off the |days|-row sketch table (bounded read)
    val b0 = table.agg(min("day").as("d0"), max("day").as("d1")).head()
    val (d0, d1) = (b0.getDate(0), b0.getDate(1))
    val span = java.time.temporal.ChronoUnit.DAYS.between(
      d0.toLocalDate, d1.toLocalDate)
    val merged = table
      .withColumn("period",
        when(datediff(col("day"), lit(d0)) * 2 <= span, 1).otherwise(2))
      .groupBy("event_type", "period")
      .agg(kll_merge_agg(col("sketch"), k).as("sk"),
        sum("n_values").as("n"))
    val p1 = merged.filter(col("period") === 1)
      .select(col("event_type"), col("sk").as("sk1"), col("n").as("n1"))
    val p2 = merged.filter(col("period") === 2)
      .select(col("event_type"), col("sk").as("sk2"), col("n").as("n2"))
    // FULL outer on event_type: a type whose mass falls entirely in
    // one period must still appear (n defaulted to 0, ks_est null) —
    // mirroring q178's n1*n2=0 → null contract, so the twins' row
    // sets stay comparable row-for-row (round-9 advisor finding).
    p1.join(p2, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        when(col("sk1").isNull || col("sk2").isNull,
          lit(null).cast("double"))
          .otherwise(round(ksDistanceUdf(col("sk1"), col("sk2")), 4))
          .as("ks_est"))
      .orderBy("event_type")
  }
}
