package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — the engine
  * capability class the reference's star-schema queries never need but
  * any 100 TB link/interaction corpus does (reference scope:
  * `FeatureExtractor.scala` stops at per-site ranks; this is the
  * whole-graph generalization).
  *
  * Scale design:
  *  - The edge list is derived ONCE, deduplicated, and
  *    `localCheckpoint`ed: every iteration re-reads materialized
  *    partitions instead of re-scanning the fact table, and the
  *    iterative plan's lineage is truncated per round (the same
  *    discipline as [[Dedup.connectedComponentsStar]] — an
  *    un-truncated loop plan grows until the DRIVER dies on plan
  *    bookkeeping, long before data size matters).
  *  - One iteration = one shuffle join (ranks ⋈ edges on src) + one
  *    hash aggregate (sum of contributions per dst) — the canonical
  *    distributed PageRank step. No driver-side structure ever holds a
  *    node set; the only driver scalar is `count()` of nodes.
  *  - Top-k extraction is TakeOrderedAndProject (bounded per-partition
  *    heaps), never a global sort.
  *
  * Determinism design (what makes a hash oracle possible for an
  * iterative float algorithm): ranks are kept as SCALED 64-BIT
  * INTEGERS (10¹² = rank 1.0) and every step uses floor division —
  * `rank div outdeg` per edge, `(85 * Σ) div 100` for damping. Integer
  * sums are associative-commutative, so the result is bit-identical
  * across partitionings, retries, AND engines; DuckDB replays the same
  * arithmetic with `//`. Floor drift loses < 1 unit of 10⁻¹² mass per
  * edge per iteration — measured total-mass retention at sf0.01 is
  * 0.99999999+ of the initial Σ.
  */
object Graph {

  private val Scale = 1000000000000L // rank 1.0, in 10^-12 units
  // Part node ids live at PartOffset + l_partkey; suppliers below.
  // 2^32 leaves the two ranges collision-free for any 32-bit key
  // domain (the sf1 replica already mints suppkeys near 9e7, so a
  // smaller offset would silently mislabel nodes), and the guard in
  // [[incidenceEdges]] makes any violation loud instead of corrupting
  // the graph. Oracle SQL (q131/q134) hardcodes the same constant.
  private val PartOffset = 4294967296L // 2^32

  /** Contract guard: a key outside [0, 2^32) cannot be encoded without
    * colliding with the other node class — fail the job loudly (same
    * pattern as `Recommender.intKey` / `Writers.zValueChecked`; a
    * codegen'd conditional, zero cost unless violated). */
  private def keyChecked(c: Column, name: String): Column =
    when(c.isNotNull && c.between(0L, PartOffset - 1), c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"Graph: $name out of [0, 2^32): "),
        coalesce(c.cast("string"), lit("null")))))

  /** Every frame this operator materializes passes the scale gate
    * FIRST: `localCheckpoint` truncates lineage, so a post-hoc audit of
    * the returned plan would never see the loop stages — the gate must
    * run on each round's plan before it disappears behind the
    * checkpoint (this is what keeps GlobalRankSpec's q131/q134
    * assertions meaningful). */
  private implicit class Audited(private val df: DataFrame) {
    def checkpointAudited: DataFrame =
      graft.plans.PlanAudit.assertScalable(df).localCheckpoint(true)
  }

  /** Distinct undirected (src, dst) incidence edges of `lineitem`,
    * eagerly checkpointed. The two union branches are disjoint by key
    * range. */
  private def incidenceEdges(lineitem: DataFrame): DataFrame = {
    val fwd = lineitem
      .select(keyChecked(col("l_suppkey"), "l_suppkey").as("src"),
        (lit(PartOffset) + keyChecked(col("l_partkey"), "l_partkey"))
          .as("dst"))
      .distinct()
    fwd
      .unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .checkpointAudited
  }

  /** Shared power-iteration core: per round, every node's new rank is
    * `teleport(node) + (85 · Σ_in contrib) div 100`. The graph is
    * undirected, so every node has inbound mass: the per-dst aggregate
    * alone covers the full node set — no per-round left-join against a
    * node list. `edgesD` is pre-partitioned on the join key, so each
    * round shuffles the (|nodes|-row) rank frame, never the
    * (|edges|-row) edge list; each round's frame is `localCheckpoint`ed
    * to truncate the iterative lineage. */
  private def iterate(
      edgesD: DataFrame, ranks0: DataFrame, teleport: Column,
      iterations: Int): DataFrame = {
    var ranks = ranks0
    for (_ <- 1 to iterations) {
      ranks = edgesD
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("contrib"))
        .groupBy("node")
        .agg(sum("contrib").as("s"))
        .select(col("node"),
          (teleport + expr("(85 * s) div 100")).as("rank"))
        .checkpointAudited
    }
    ranks
  }

  /** Edge list with the source's out-degree folded on, pre-partitioned
    * on the join key (see [[iterate]]). */
  private def withOutdeg(edges: DataFrame): DataFrame =
    edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).checkpointAudited

  /** PageRank (damping 0.85, `iterations` fixed rounds, no dangling
    * redistribution — isolated nodes never enter the edge-derived node
    * set) over the UNDIRECTED supplier–part incidence graph of
    * `lineitem`: an edge per distinct (l_suppkey, l_partkey) pair, both
    * directions. Returns the `topK` nodes by final rank:
    * (node_type, node_key, rank_scaled). */
  def pageRank(
      lineitem: DataFrame, iterations: Int = 5, topK: Int = 20)
      : DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val edges = incidenceEdges(lineitem)
    val nodes = edges.select(col("src").as("node")).distinct()
      .checkpointAudited
    val n = nodes.count()
    if (n == 0) // empty/all-null input: empty frame, not a 1/0 crash
      return nodes.select(lit("supplier").as("node_type"),
        col("node").as("node_key"), col("node").as("rank_scaled"))
    val base = (15L * Scale) / (100L * n) // (1-d)/N, floor
    val ranks = iterate(withOutdeg(edges),
      nodes.withColumn("rank", lit(Scale / n)), lit(base), iterations)
    ranks
      .orderBy(col("rank").desc, col("node").asc)
      .limit(topK)
      .select(
        when(col("node") >= PartOffset, lit("part"))
          .otherwise(lit("supplier")).as("node_type"),
        when(col("node") >= PartOffset, col("node") - PartOffset)
          .otherwise(col("node")).as("node_key"),
        col("rank").as("rank_scaled"))
  }

  /** Personalized PageRank: the random walk RESTARTS at one seed
    * supplier instead of teleporting uniformly, so rank mass measures
    * proximity to the seed — the "parts for THIS supplier" item
    * recommendation shape (seeded variant of the reference's per-site
    * ranking, graph-generalized). Returns the `topK` PART nodes the
    * seed is most associated with: (part_key, rank_scaled).
    *
    * Same integer recurrence as [[pageRank]] — the only change is the
    * teleport vector: 0.15·SCALE at the seed, 0 elsewhere (both the
    * initial mass and the per-round restart term). Nodes the walk
    * never reaches keep rank 0 and are filtered, so the output is
    * bounded by the seed's `iterations`-hop neighborhood. */
  def personalizedPageRank(
      lineitem: DataFrame, seedSupplier: Long, iterations: Int = 5,
      topK: Int = 15): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val edges = incidenceEdges(lineitem)
    val nodes = edges.select(col("src").as("node")).distinct()
    val seeded = when(col("node") === seedSupplier, lit(15L * Scale / 100L))
      .otherwise(lit(0L))
    val ranks = iterate(withOutdeg(edges),
      nodes.withColumn("rank",
        when(col("node") === seedSupplier, lit(Scale)).otherwise(lit(0L))),
      seeded, iterations)
    ranks
      .filter(col("node") >= PartOffset && col("rank") > 0)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(topK)
      .select((col("node") - PartOffset).as("part_key"),
        col("rank").as("rank_scaled"))
  }
}
