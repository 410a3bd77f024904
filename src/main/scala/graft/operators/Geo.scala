package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial operators (SURVEY §2.12): grid-cell-pruned radius search —
  * the spatial-join shape every geo workload starts with, built the
  * way a distributed engine has to build it: coarse integer grid
  * cells prune candidates (the same space-filling-curve locality idea
  * as q160's Z-order clustering), exact distance filters the
  * survivors. The fixture has no real coordinates, so points are
  * PLANTED deterministically from `c_custkey` (two-prime modular
  * scatter — the q216/q228 planting convention; the oracle replays
  * it), in integer micro-units on a 10⁴×10⁴ planar grid.
  *
  * The GATE is all-integer: membership compares the exact squared
  * planar distance `d² = Δx² + Δy²` against `R²` — no haversine
  * float, no trig-library ulp hazard anywhere in the decision (the
  * planar approximation is the documented small-radius contract;
  * a great-circle display column would be the only float and is
  * deliberately omitted from the gate).
  */
object Geo {

  /** Deterministic planted coordinates: md5-scattered customer keys
    * on an integer grid with `x ∈ [0, 10000]` (inclusive — see the
    * twin note below) and `y ∈ [0, 9999]` (the minhash h1/h2 idiom —
    * two 32-bit hex windows of one digest). The twin shift `+1` is
    * applied AFTER the `% 10000` reduction, so a twin whose hash
    * lands on 9999 gets `x = 10000` — one unit past the nominal
    * 10⁴ domain. Engine, oracle, and GeoSpec all share this exact
    * field, so the gates agree; but a consumer packing coordinates
    * as `x*10000 + y` (or otherwise assuming `x < 10000`) must use
    * 10001 as the stride. Kept as-is rather than pre-mod-shifting
    * because the planted field is frozen into committed oracle
    * hashes across three rounds. A LINEAR scatter (k·prime mod m)
    * would be a lattice where pair distance depends only on the key
    * difference — degenerate geometry with zero close pairs at small
    * corpora and huge aligned families at large ones; the hash
    * scatter gives the Poisson point field a spatial gate needs.
    *
    * TWIN PLANTING (the q202 scale-covariant convention): keys with
    * `k % 50 == 1` take the coordinates of `k + 1` shifted by
    * (+1, 0), so a distance-1 pair (k, k+1) exists at every scale
    * factor — at sf0.001's 150 points the organic expectation for
    * q234's radius is ~0.2 pairs, and a gate whose output is
    * structurally empty at a declared fixture is vacuous. Twins are
    * PAIRS, never clusters (k+1 itself is always a normal key), so
    * the planted pair count grows linearly, not quadratically. */
  def custPoints(customer: DataFrame): DataFrame = {
    val k = col("c_custkey").cast("long")
    val twin = k % 50L === 1L
    val ek = when(twin, k + 1L).otherwise(k)
    val h = md5(ek.cast("string"))
    customer.select(k.as("c_custkey"),
      (conv(substring(h, 1, 8), 16, 10).cast("long") % 10000L
        + when(twin, 1L).otherwise(0L)).as("x"),
      (conv(substring(h, 9, 8), 16, 10).cast("long") % 10000L).as("y"))
  }

  /** q233 — radius search over the planted points for `nQueries`
    * fixed query centers: per query, the number of customers within
    * `radius`, the minimum squared distance, and the nearest customer
    * (deterministic (d², custkey) argmin). Queries with no match emit
    * an explicit zero row (never silently dropped).
    *
    * Scale: points map to `cellSize`-wide grid cells on the scan; the
    * |queries|-row frame broadcasts with a ±`cellReach`-cell window
    * (`cellReach·cellSize ≥ radius + cellSize`, so pruning is
    * provably lossless — GeoSpec referees cell-join == full-scan
    * corpus-wide); only candidates inside the window pay the exact
    * d² arithmetic. The corpus is never crossed with itself and the
    * per-query candidate count is area-bounded (≈ (2·reach+1)²·cell
    * occupancy), independent of total corpus size once cells are
    * pruned at the scan — the q160 locality story as a join. */
  def radiusSearch(
      customer: DataFrame,
      nQueries: Int = 5,
      radius: Long = 650L,
      cellSize: Long = 500L): DataFrame = {
    val spark = customer.sparkSession
    val cellReach = (radius + cellSize - 1) / cellSize + 1
    val pts = custPoints(customer)
      .withColumn("cx", expr(s"x div $cellSize"))
      .withColumn("cy", expr(s"y div $cellSize"))
    val qs = spark.range(nQueries).select(
      col("id").as("qid"),
      ((col("id") * 2741L + 1234L) % 10000L).as("qx"),
      ((col("id") * 6151L + 4321L) % 10000L).as("qy"))
      .withColumn("qcx", expr(s"qx div $cellSize"))
      .withColumn("qcy", expr(s"qy div $cellSize"))
    val cand = pts.join(broadcast(qs),
      abs(col("cx") - col("qcx")) <= cellReach &&
        abs(col("cy") - col("qcy")) <= cellReach)
    val hits = cand
      .withColumn("d2",
        (col("x") - col("qx")) * (col("x") - col("qx"))
          + (col("y") - col("qy")) * (col("y") - col("qy")))
      .filter(col("d2") <= radius * radius)
    val agg = hits.groupBy("qid").agg(
      count(lit(1)).as("n_within"),
      min(struct(col("d2"), col("c_custkey"))).as("__m"))
    qs.select("qid", "qx", "qy").join(agg, Seq("qid"), "left")
      .select(col("qid"), col("qx"), col("qy"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("__m.d2").as("min_d2"),
        col("__m.c_custkey").as("nearest_custkey"))
      .orderBy("qid")
  }

  /** q234 — distance SELF-join: every customer pair within `radius`,
    * each pair exactly once (`a < b`) — the spatial-join shape that
    * separates a real engine from a toy: the naive form is corpus ×
    * corpus (n² distance checks — 2.25·10¹⁰ already at sf1), the
    * grid form replicates each point into its (2·reach+1)² neighbor
    * cells and EQUI-joins on the target cell, so every qualifying
    * pair is found exactly once (the partner's anchor cell is
    * unique) and the work is Σ_cell |cell|·|window| — density-bound,
    * never n². Same all-integer membership as [[radiusSearch]].
    *
    * Scale: the replicate-explode is a constant (2·reach+1)² factor
    * on the point table; the join is a plain shuffled equi-join on
    * (cell_x, cell_y) — co-partitioned, AQE-skew-splittable if one
    * cell is hot; exact d² only inside the window. */
  def distanceSelfJoin(
      customer: DataFrame,
      radius: Long = 25L,
      cellSize: Long = 100L): DataFrame = {
    val reach = (radius + cellSize - 1) / cellSize
    val pts = custPoints(customer)
      .withColumn("cx", expr(s"x div $cellSize"))
      .withColumn("cy", expr(s"y div $cellSize"))
    val repl = pts
      .withColumn("dx", explode(sequence(lit(-reach), lit(reach))))
      .withColumn("dy", explode(sequence(lit(-reach), lit(reach))))
      .select(col("c_custkey").as("a_custkey"),
        col("x").as("ax"), col("y").as("ay"),
        (col("cx") + col("dx")).as("bx"), (col("cy") + col("dy")).as("by"))
    val anchored = pts.select(col("c_custkey").as("b_custkey"),
      col("x").as("px"), col("y").as("py"),
      col("cx").as("bx"), col("cy").as("by"))
    repl.join(anchored, Seq("bx", "by"))
      .filter(col("a_custkey") < col("b_custkey"))
      .withColumn("d2",
        (col("ax") - col("px")) * (col("ax") - col("px"))
          + (col("ay") - col("py")) * (col("ay") - col("py")))
      .filter(col("d2") <= radius * radius)
      .select(col("a_custkey"), col("b_custkey"), col("d2"))
      .orderBy("a_custkey", "b_custkey")
  }
}
