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

  /** q142 — triangle counting over the frequent co-purchase graph:
    * parts are nodes, an edge means the pair was bought together in at
    * least `minSupport` distinct orders, and a triangle is a
    * tightly-coupled product triple (the 3-way extension of q133's
    * pairwise basket lift). Returns per-part triangle participation
    * counts: (p_partkey, n_triangles), exact integers.
    *
    * Scale design, stage by stage:
    *  - Edge generation is the per-basket self-join on l_orderkey —
    *    quadratic only in BASKET size (TPC-H baskets are ≤ 7 lines),
    *    so it is linear in orders. The support threshold is the
    *    Apriori-style frequency prune: it runs BEFORE anything
    *    quadratic in the graph and thins random co-occurrence down to
    *    the genuinely associated pairs (115k → 3.4k edges at sf0.01).
    *  - Wedge enumeration uses the degree-ordered orientation of Suri
    *    & Vassilvitskii ("Counting triangles and the curse of the last
    *    reducer", WWW'11): each edge points from its lower (degree,
    *    id) endpoint to the higher, so a node's wedge fan-out is
    *    C(out-degree, 2) and the total wedge count is O(m^{3/2})
    *    regardless of skew — a hub of degree d contributes O(m) wedges
    *    instead of O(d²). Every stage is a shuffle equi-join or hash
    *    aggregate; nothing collects to the driver.
    *  - Each triangle is counted exactly once (its two lowest-order
    *    corners form the wedge; the closing edge carries the same
    *    orientation), so the per-node count is a 3-way explode +
    *    hash aggregate.
    *
    * The DuckDB oracle counts the same triangles with the plain
    * id-ordered triple join — fine at oracle scale, while the Spark
    * side keeps the skew-proof orientation. */
  def basketTriangles(lineitem: DataFrame, minSupport: Int = 2)
      : DataFrame = {
    val op = lineitem
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = op.as("x")
      .join(op.as("y"), col("x.o") === col("y.o") &&
        col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
      .select("a", "b")
      .checkpointAudited
    val deg = edges
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient each edge from the lower (degree, id) endpoint; carry the
    // out-endpoint's order key for the wedge-side comparison below
    val withDeg = edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, col("db")).otherwise(col("da")).as("dv"))
      .checkpointAudited
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (struct(col("e1.dv"), col("e1.v")) <
          struct(col("e2.dv"), col("e2.v"))))
      .select(col("e1.u").as("t1"), col("e1.v").as("t2"),
        col("e2.v").as("t3"))
    val triangles = wedges.join(
      oriented.select(col("u").as("t2"), col("v").as("t3")),
      Seq("t2", "t3"))
    triangles
      .select(explode(array(col("t1"), col("t2"), col("t3")))
        .as("p_partkey"))
      .groupBy("p_partkey").agg(count(lit(1)).as("n_triangles"))
      .orderBy("p_partkey")
  }

  /** q172 — BFS hop distance from a seed supplier over the same
    * undirected supplier–part incidence graph as q131/q134: "how far
    * is every part/supplier from THIS supplier" — the supply-chain
    * reachability question the rank family (pagerank = importance,
    * PPR = affinity) doesn't answer. Classic distributed frontier BFS:
    * per hop, one shuffle join of the (shrinking) frontier against the
    * pre-partitioned edge list, an anti-join against the settled set
    * (a node's FIRST discovery is its distance — exact min-hop by
    * construction), per-round localCheckpoint (the q131 lineage
    * discipline). Work per round is O(edges out of frontier), rounds
    * bounded by `maxHops` — at 100 TB the frontier frame stays
    * node-sized while the edge list never re-shuffles. Integer hops →
    * full hash oracle (recursive-CTE min-hop replay, the q42
    * discipline). */
  def bfsHops(
      lineitem: DataFrame, seedSupplier: Long = 7L,
      maxHops: Int = 4): DataFrame = {
    val spark = lineitem.sparkSession
    import spark.implicits._
    val edges = incidenceEdges(lineitem)
      .repartition(col("src")).checkpointAudited
    var dist = Seq((seedSupplier, 0L)).toDF("node", "hop")
    var frontier = dist.select("node")
    for (h <- 1 to maxHops) {
      val next = edges
        .join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .checkpointAudited
      // dist re-checkpoints each hop DELIBERATELY: the lazy-union
      // alternative (union of the checkpointed hop frames) was
      // measured SLOWER at sf0.1 (2.7 → 3.9 s focused) — each hop's
      // anti-join side becomes a union of k × |parts| partitions and
      // the per-hop task count grows quadratically, costing more than
      // the one re-materialization job it saves
      dist = dist.unionByName(next).checkpointAudited
      frontier = next.select("node")
    }
    dist.orderBy("hop", "node")
  }
}
