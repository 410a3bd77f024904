package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** [[Graph.pageRank]] — integer-exact iterative PageRank. The oracle
  * (q131) pins cross-engine agreement; these pin the algorithm itself
  * against an independent driver-side recurrence and its conservation
  * laws. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Independent single-threaded implementation of the same scaled
    * integer recurrence (adjacency maps, no Spark). `seed = None` is
    * uniform PageRank; `Some(s)` is the personalized restart at s. */
  private def brute(
      pairs: Seq[(Long, Long)], iters: Int,
      seed: Option[Long] = None): Map[Long, Long] = {
    val fwd = pairs.distinct.map { case (s, p) => (s, 4294967296L + p) }
    val edges = (fwd ++ fwd.map(_.swap)).distinct
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size
    def teleport(v: Long): Long = seed match {
      case None => 15L * 1000000000000L / (100L * n)
      case Some(s) => if (v == s) 15L * 1000000000000L / 100L else 0L
    }
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = seed match {
      case None => nodes.map(_ -> 1000000000000L / n).toMap
      case Some(s) =>
        nodes.map(v => v -> (if (v == s) 1000000000000L else 0L)).toMap
    }
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for ((s, d) <- edges) sums(d) += rank(s) / outdeg(s)
      rank = nodes.map(v => v -> (teleport(v) + 85L * sums(v) / 100L))
        .toMap
    }
    rank
  }

  private def asMap(
      df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map { r =>
      val key = r.getLong(1)
      val node =
        if (r.getString(0) == "part") 4294967296L + key else key
      node -> r.getLong(2)
    }.toMap

  test("pageRank matches an independent driver-side recurrence") {
    // asymmetric: supplier 1 touches three parts, others one each;
    // part 10 is shared — degrees 1..3 exercise the floor divisions
    val pairs = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L),
      (3L, 13L), (3L, 10L))
    val df = pairs.toDF("l_suppkey", "l_partkey")
    val got = asMap(Graph.pageRank(df, iterations = 5, topK = 1000))
    assert(got == brute(pairs, 5))
  }

  test("duplicate lineitem rows do not change the graph") {
    val pairs = Seq((1L, 10L), (2L, 10L), (1L, 11L))
    val dup = pairs ++ pairs ++ pairs
    val a = asMap(Graph.pageRank(pairs.toDF("l_suppkey", "l_partkey")))
    val b = asMap(Graph.pageRank(dup.toDF("l_suppkey", "l_partkey")))
    assert(a == b)
  }

  test("rank mass is conserved up to floor drift on real data") {
    val all = Graph.pageRank(tables.lineitem, topK = 1000000)
    val agg = all.agg(
      sum("rank_scaled").as("mass"), count(lit(1)).as("n")).head()
    val mass = agg.getLong(0)
    val n = agg.getLong(1)
    // every node got an initial SCALE/N share; each of 5 iterations
    // loses < 1 unit per edge-contribution plus the two final floors
    assert(mass <= 1000000000000L)
    assert(mass > 999999000000L, s"mass drifted to $mass")
    assert(n > 0 && all.filter(col("rank_scaled") <= 0).isEmpty)
  }

  test("personalized pageRank matches the seeded brute recurrence " +
    "and stays inside the seed's reachable neighborhood") {
    // two disconnected components: seed 1's walk must never assign
    // mass to component B's parts
    val compA = Seq((1L, 10L), (1L, 11L), (2L, 11L))
    val compB = Seq((5L, 50L), (5L, 51L))
    val df = (compA ++ compB).toDF("l_suppkey", "l_partkey")
    val got = Graph.personalizedPageRank(df, seedSupplier = 1L,
        iterations = 5, topK = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = brute(compA ++ compB, 5, seed = Some(1L))
      .collect { case (node, r) if node >= 4294967296L && r > 0 =>
        (node - 4294967296L) -> r }
    assert(got == exp)
    assert(!got.contains(50L) && !got.contains(51L),
      "mass leaked into a disconnected component")
    // direct neighbors of the seed outrank parts two hops out
    assert(got(10L) > 0 && got(11L) > 0)
  }

  test("a key outside [0, 2^32) fails loudly instead of mislabeling") {
    // 2^32 would collide with part node 0 — the old silent-corruption
    // case the keyChecked guard now turns into a job failure
    val bad = Seq((4294967296L, 10L)).toDF("l_suppkey", "l_partkey")
    val e = intercept[Exception] {
      Graph.pageRank(bad, iterations = 1).collect()
    }
    assert(e.getMessage.contains("out of [0, 2^32)"), e.getMessage)
    val neg = Seq((1L, -1L)).toDF("l_suppkey", "l_partkey")
    val e2 = intercept[Exception] {
      Graph.pageRank(neg, iterations = 1).collect()
    }
    assert(e2.getMessage.contains("out of [0, 2^32)"), e2.getMessage)
  }

  test("empty input yields an empty frame from both entry points") {
    val empty = Seq.empty[(Long, Long)].toDF("l_suppkey", "l_partkey")
    assert(Graph.pageRank(empty).isEmpty)
    assert(Graph.personalizedPageRank(empty, seedSupplier = 1L).isEmpty)
  }

  test("regular bipartite graph yields uniform ranks within a type") {
    // 3 suppliers x 4 parts, complete: supplier outdeg 4, part outdeg 3
    val pairs = for { s <- 1L to 3L; p <- 10L to 13L } yield (s, p)
    val byType = asMap(
      Graph.pageRank(pairs.toDF("l_suppkey", "l_partkey")))
      .groupBy { case (node, _) => node >= 4294967296L }
      .view.mapValues(_.values.toSet).toMap
    assert(byType(false).size == 1, "suppliers not uniform")
    assert(byType(true).size == 1, "parts not uniform")
  }

  /** Brute-force triangle counter over the support-filtered basket
    * graph (adjacency sets, id-ordered triple loop — independent of
    * the degree-ordered Spark path). */
  private def bruteTriangles(
      baskets: Seq[(Long, Long)], minSupport: Int): Map[Long, Long] = {
    val pairs = baskets.distinct
      .groupBy(_._1).values.toSeq
      .flatMap { items =>
        val ps = items.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- (i + 1) until ps.size)
          yield (ps(i), ps(j))
      }
    val edges = pairs.groupBy(identity).view
      .filter(_._2.size >= minSupport).keys.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      if edges((nodes(i), nodes(j)))
      k <- (j + 1) until nodes.size
      if edges((nodes(j), nodes(k))) && edges((nodes(i), nodes(k)))
    } Seq(nodes(i), nodes(j), nodes(k)).foreach(n => counts(n) += 1)
    counts.toMap
  }

  private def gotTriangles(
      baskets: Seq[(Long, Long)], minSupport: Int = 2): Map[Long, Long] =
    Graph.basketTriangles(
        baskets.toDF("l_orderkey", "l_partkey"), minSupport)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("basketTriangles: known triples, support prune, exact counts") {
    // orders 1,2 repeat {1,2,3}; 3,4 repeat {1,2,4}; order 5 is a
    // one-off {3,4,5} whose edges fall below support 2
    val baskets = Seq(
      1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 2L -> 2L, 2L -> 3L,
      3L -> 1L, 3L -> 2L, 3L -> 4L, 4L -> 1L, 4L -> 2L, 4L -> 4L,
      5L -> 3L, 5L -> 4L, 5L -> 5L)
    val got = gotTriangles(baskets)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    assert(got == bruteTriangles(baskets, 2))
  }

  test("basketTriangles: hub skew matches brute force") {
    // part 100 co-occurs (twice) with every spoke; spokes also pair
    // among consecutive neighbors — many wedges through the hub, and
    // the degree orientation must still count each triangle once
    val baskets = (1L to 8L).flatMap { s =>
      Seq(s -> 100L, s -> s, s -> (s % 8 + 1),
        (100 + s) -> 100L, (100 + s) -> s, (100 + s) -> (s % 8 + 1))
    }
    val got = gotTriangles(baskets)
    assert(got.nonEmpty)
    assert(got == bruteTriangles(baskets, 2))
  }

  test("basketTriangles: triangle-free and empty inputs yield empty") {
    // two repeated pair-only baskets: edges but no triangle
    val pairOnly = Seq(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L)
    assert(gotTriangles(pairOnly).isEmpty)
    assert(gotTriangles(Seq.empty[(Long, Long)]).isEmpty)
  }

  // ---- q172 BFS hop distance ---------------------------------------

  private def bruteBfs(
      pairs: Seq[(Long, Long)], seed: Long,
      maxHops: Int): Map[Long, Long] = {
    val fwd = pairs.distinct.map { case (s, p) => (s, 4294967296L + p) }
    val edges = (fwd ++ fwd.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = Map(seed -> 0L)
    var frontier = Set(seed)
    for (h <- 1 to maxHops) {
      val next = frontier.flatMap(n => edges.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h.toLong)
      frontier = next
    }
    dist
  }

  private def gotBfs(
      pairs: Seq[(Long, Long)], seed: Long,
      maxHops: Int): Map[Long, Long] =
    Graph.bfsHops(pairs.toDF("l_suppkey", "l_partkey"), seed, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bfsHops: crafted chain — alternating supplier/part hops, " +
    "unreachable component absent, seed at hop 0") {
    // s1—p101—s2—p102 ; disconnected s9—p999
    val pairs = Seq(1L -> 101L, 2L -> 101L, 2L -> 102L, 9L -> 999L)
    val got = gotBfs(pairs, seed = 1L, maxHops = 4)
    assert(got == Map(
      1L -> 0L, (4294967296L + 101L) -> 1L, 2L -> 2L,
      (4294967296L + 102L) -> 3L))
  }

  test("bfsHops equals a brute-force BFS on a random-ish graph and " +
    "respects the hop cap") {
    val pairs = (1L to 40L).flatMap { s =>
      Seq(s -> (s % 7 + 1), s -> (s % 11 + 1), s -> ((s * 3) % 13 + 1))
    }
    val got = gotBfs(pairs, seed = 5L, maxHops = 3)
    assert(got == bruteBfs(pairs, 5L, 3))
    assert(got.values.max <= 3L)
    assert(got(5L) == 0L)
  }
}
