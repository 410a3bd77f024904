package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (SURVEY §2.10 X2):
  * brute-force cosine top-k as the exact baseline and a random-
  * hyperplane LSH bucketed variant as the 100 TB scale path.
  *
  * Vector math is pure Catalyst (`zip_with` + `aggregate` on
  * ARRAY<DOUBLE>): codegen'd, no UDFs, no MLlib Vector boxing. Sums run
  * left-to-right in index order, so results are deterministic and
  * reproducible in any engine that evaluates the same order.
  */
object Similarity {

  /** Float embedding → ARRAY<DOUBLE> (all math in double: float
    * accumulation drifts and would break cross-engine comparison). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via the native codegen'd [[graft.functions.VectorDot]]
    * expression — one fused loop, no intermediate array. Identical
    * index-ascending summation order to [[dotHof]], so results are
    * bit-equal (asserted in SimilaritySpec). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_dot(a, b)

  /** Higher-order-function formulation (`zip_with` + `aggregate`) —
    * kept as the pure-built-ins reference implementation. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** q26 — exact cosine top-k: for each query vector (`vec_id` ∈
    * queryIds), the k nearest other vectors by cosine.
    *
    * Plan shape: the (tiny) query set is broadcast against the corpus —
    * a map-side nested loop over each corpus partition, then a top-k
    * window per query id. At 1000 executors this is embarrassingly
    * parallel over the corpus and shuffles only |queries|·|corpus-
    * partition winners| rows into the final window.
    * Ordering ties broken by vec_id; ordering key is the cosine rounded
    * to 6 decimals so the ranking (not just the output) is reproducible
    * across engines.
    */
  /** q194 — embedding-space diagnostics per class: vector count, norm
    * mean/spread, centroid norm, and the MEAN PAIRWISE COSINE within
    * the class — the collapse/anisotropy panel run before trusting an
    * embedding column for SemDeDup (q100), ANN (q26/q166), or
    * clustering: a class whose mean pairwise cosine drifts toward 1 is
    * collapsing (near-dup thresholds silently change meaning), one
    * near 0 is isotropic.
    *
    * The scale trick is the sum-norm identity: with unit vectors û,
    * Σ_{i≠j} cos(û_i,û_j) = ‖Σû‖² − n, so the all-pairs mean is
    * (‖Σû‖² − n)/(n(n−1)) — ONE pass and a per-(class, dim) hash
    * aggregate (≤ |classes|·dim cells), never the O(n²) pair join.
    * Everything is built from two aggregates joined on the bounded
    * class key: the (class, dim) sums of raw and normalized
    * components (map-side partial sums), and the per-class scalar
    * norm stats. Per-row math (norm, the divide) is IEEE-deterministic
    * on both engines; only the final sums are order-sensitive, and
    * all emitted floats round 4 dp (the q71 centroid convention). */
  def embeddingDiagnostics(embeddings: DataFrame): DataFrame = {
    // zero-norm vectors carry no direction: they would poison the
    // normalized sums into NaN for the whole class, so they are
    // excluded from the panel (documented contract; the oracle
    // filters identically). Singleton classes have no pairs: mean_cos
    // and sd_norm are NULL there, not 0/0 (matching DuckDB's
    // STDDEV_SAMP-of-one NULL so the gate stays engine-portable).
    val base = embeddings
      .select(col("label"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm(col("e")))
      .filter(col("nrm") > 0)
    val dims = base
      .select(col("label"), col("nrm"), posexplode(col("e")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("sv"),
        sum(col("col") / col("nrm")).as("su"))
      .groupBy("label")
      .agg(sum(col("sv") * col("sv")).as("sv2"),
        sum(col("su") * col("su")).as("su2"))
    val scal = base.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), avg(col("nrm")).as("mean_norm"),
        stddev_samp(col("nrm")).as("sd_norm"))
    scal.join(dims, "label")
      .select(col("label"), col("n_vecs"),
        round(col("mean_norm"), 4).as("mean_norm"),
        when(col("n_vecs") > 1, round(col("sd_norm"), 4)).as("sd_norm"),
        round(sqrt(col("sv2")) / col("n_vecs"), 4).as("centroid_norm"),
        when(col("n_vecs") > 1,
          round((col("su2") - col("n_vecs"))
            / (col("n_vecs") * (col("n_vecs") - lit(1)).cast("double")),
            4) + lit(0.0)).as("mean_cos"))
      .orderBy("label")
  }

  /** q71 — per-group embedding centroids (the k-means/IVF training
    * primitive as a declarative aggregate): explode to (group, dim,
    * value) and hash-aggregate per (group, dim). Shuffle volume is
    * |vectors|·dim scalar rows with map-side partial sums — the
    * standard distributed centroid shape; at 100 TB the alternative is
    * a typed Aggregator over whole arrays, traded off in SURVEY §2.12.
    * Dims are 1-based to match SQL array indexing. */
  def groupCentroids(
      embeddings: DataFrame, groups: DataFrame, groupCol: String)
      : DataFrame =
    embeddings.join(groups, "vec_id")
      .select(col(groupCol), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col(groupCol), (col("pos") + 1).cast("long").as("dim"))
      // + 0.0 collapses IEEE negative zero (an avg a hair below zero
      // rounds to -0.0, which hash-compares unequal to 0.0)
      .agg((round(avg(col("v").cast("double")), 4) + lit(0.0))
        .as("centroid"))
      .orderBy(groupCol, "dim")

  /** Q77 — cosine top-k written entirely in SQL against the registered
    * native [[graft.functions.VectorDot]] (`vec_dot`): the codegen'd
    * fused-loop expression is what the SQL text plans to, proving the
    * FunctionRegistry surface gives SQL users the same hot path as the
    * Column API. Broadcast hint on the |q|-row side; evaluation order
    * of vec_dot is index-ascending, matching the oracle's
    * list_transform formulation bit-for-bit. */
  def sqlCosineTopK(t: graft.Tables): DataFrame = {
    graft.plans.GraftExtensions.register(t.spark)
    t.embeddings.createOrReplaceTempView("graft_q77_embeddings")
    t.spark.sql(
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS e
        |  FROM graft_q77_embeddings),
        |q AS (SELECT vec_id AS qid, e AS qv FROM v WHERE vec_id < 5),
        |s AS (
        |  SELECT /*+ BROADCAST(q) */ qid, vec_id AS cid,
        |         ROUND(vec_dot(qv, e) /
        |           (SQRT(vec_dot(qv, qv)) * SQRT(vec_dot(e, e))), 6) AS cos
        |  FROM v JOIN q ON vec_id <> qid),
        |rk AS (
        |  SELECT qid, cid, cos,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY cos DESC, cid) AS rk
        |  FROM s)
        |SELECT qid, cid, cos, CAST(rk AS BIGINT) AS rk
        |FROM rk WHERE rk <= 3
        |ORDER BY qid, rk""".stripMargin)
  }

  def cosineTopK(
      embeddings: DataFrame, queryMaxId: Long = 10, k: Int = 5): DataFrame = {
    // norms precomputed per vector (not per pair): |q|+|c| sqrt loops
    // instead of 2·|q|·|c|; numerically identical to inline norms
    val q = embeddings.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val c = embeddings
      .select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(
        col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cos"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  /** Random-hyperplane signature: bit i = sign(v · h_i) where h_i is a
    * deterministic ±1 hyperplane derived from xxhash64(i, dim) — no
    * stored projection matrix, any executor can recompute it. */
  def hyperplaneSig(v: Column, dim: Int, bits: Int): Column = {
    val planes = (0 until bits).map { i =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * when(pmod(xxhash64(lit(i), j), lit(2)) === 0, 1.0)
            .otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** Approximate NN via LSH bucketing: vectors sharing a signature
    * band become candidates; exact cosine re-ranks candidates only.
    * The scale path — candidate count is collision-driven, the corpus
    * is never crossed with itself. Recall is tested against
    * [[cosineTopK]] in SimilaritySpec. */
  def lshCosineTopK(
      embeddings: DataFrame, dim: Int = 64, queryMaxId: Long = 10,
      k: Int = 5, bits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = bits / bands
    val mask = (1L << rows) - 1
    val sig = embeddings.select(
      col("vec_id"), asDouble(col("embedding")).as("v"),
      hyperplaneSig(asDouble(col("embedding")), dim, bits).as("sig"))
      .withColumn("n", norm(col("v")))
    val banded = sig.select(
      col("vec_id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rows).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bkey")))
    val q = banded.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n").as("qn"),
        col("band"), col("bkey"))
    val cand = banded.as("c")
      .join(broadcast(q),
        col("c.band") === q("band") && col("c.bkey") === q("bkey")
          && col("c.vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qn"), col("c.vec_id").as("cid"),
        col("c.v").as("cv"), col("c.n").as("cn"))
      .distinct()
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    cand
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("qid", "cid", "cos", "rk")
      .orderBy("qid", "rk")
  }

  /** Engine-portable hyperplane signs: sign(i,j) = high bit of the
    * first hex digit of md5("i:j") — pure constants, computed once at
    * plan build; any md5-capable engine derives the identical matrix
    * (the SQL oracle rebuilds it from range()×range()). */
  def md5PlaneSigns(dim: Int, bits: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dim) { (i, j) =>
      val h = md.digest(s"$i:$j".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** q35 — embedding-cosine near-dup pairs with a fully portable LSH:
    * md5-derived hyperplane signatures → 4-bit band buckets → exact
    * cosine over collisions only. Both engines compute identical
    * signatures, so the (recall < 1) candidate set is itself
    * deterministic and oracle-comparable — and there is still no cross
    * join anywhere. */
  def embeddingNearDupsPortable(
      embeddings: DataFrame, dim: Int = 64, minCos: Double = 0.4,
      bits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = bits / bands
    val mask = (1L << rows) - 1
    val signs = md5PlaneSigns(dim, bits)
    val sigCol = (0 until bits).map { i =>
      val plane = array(signs(i).toIndexedSeq.map(lit): _*)
      when(dot(col("v"), plane) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("sg", sigCol)
    val banded = sig.select(
      col("vec_id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sg"), b * rows).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bkey")))
    // cos is a pure function of the pair, so computing it BEFORE the
    // multi-band dedup means the distinct exchange carries (id, id,
    // cos) — 24 bytes — instead of the two 64-double vectors (~1 KB)
    // per candidate row (guide-§2.3 "project before the exchange";
    // duplicate band collisions recompute one dot product each, far
    // cheaper than shuffling their payloads)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_i"), col("b.vec_id").as("vec_j"),
        round(dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), 6)
          .as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
      .orderBy("vec_i", "vec_j")
  }

  /** q219 — CROSS-LINGUAL near-dup pairs (translation-duplicate
    * detection): the q35 portable-LSH cosine pairs restricted to pairs
    * whose documents carry DIFFERENT language tags — the signal that
    * catches machine-translated copies and parallel-corpus bleed,
    * which every shingle/token dedup (q19/q135) is blind to by
    * construction (different surface forms) and same-language semantic
    * dedup (q100) deliberately keeps. Mined cross-lingual pairs are
    * also exactly the web-parallel-corpus shape (WikiMatrix/CCMatrix).
    *
    * Scale: the language frame is a 2-narrow-column side joined AFTER
    * the LSH band filter — it rides the (already pruned) pair frame,
    * never the corpus×corpus space; everything upstream is q35's
    * banded self-join. The lang filter cannot be pushed below the
    * band join (it needs both sides), which is the right order: bands
    * prune ~99% first. The DECLARED gate pins the oracle-portable
    * 16-bit/4-band signature, whose within-bucket candidate count
    * grows ~n²/2¹⁶ as density rises (measured 1.7 exponent at
    * sf0.1→sf1 — the fixed-bit LSH density cost, same contract as
    * q35); the knob a 100 TB caller turns is `bits`/`bands`
    * (signature width — candidates fall ~2^Δrows per widened band),
    * or the IVF/SQ8 ANN family for recall-bounded budgets. */
  def crossLingualNearDups(
      embeddings: DataFrame, docLangs: DataFrame,
      dim: Int = 64, minCos: Double = 0.4,
      bits: Int = 16, bands: Int = 4): DataFrame = {
    val pairs =
      embeddingNearDupsPortable(embeddings, dim, minCos, bits, bands)
    val li = docLangs.select(col("vec_id").as("vec_i"),
      col("lang").as("lang_i"))
    val lj = docLangs.select(col("vec_id").as("vec_j"),
      col("lang").as("lang_j"))
    pairs.join(li, "vec_i").join(lj, "vec_j")
      .filter(col("lang_i") =!= col("lang_j"))
      .select(col("vec_i"), col("vec_j"), col("lang_i"), col("lang_j"),
        col("cos"))
      .orderBy("vec_i", "vec_j")
  }

  /** IVF (inverted-file) approximate NN — the other standard ANN scale
    * path besides LSH: a seeded k-means coarse quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells and exact cosine re-ranks only those cells' vectors.
    *
    * Plan shape at scale: centroids are tiny (nlist × dim, broadcast);
    * cell assignment is one map-side pass; the probe join is an
    * equi-join on cell id. Corpus is hash-partitioned by cell — the
    * classic FAISS-style IVF layout expressed as DataFrames. Recall vs
    * brute force is asserted in SimilaritySpec. */
  def ivfCosineTopK(
      embeddings: DataFrame, dim: Int = 64, queryMaxId: Long = 10,
      k: Int = 5, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val vecs = embeddings.select(
      col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("features", array_to_vector(col("v")))
      .cache()
    val km = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(vecs)
    // centroid list as literal arrays: tiny, recomputable on any executor
    val centroids = model.clusterCenters.zipWithIndex.map {
      case (c, i) => (i, c.toArray)
    }
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("v"), col("n"), col("cell"))
    // query-side: distance to every centroid (nlist is small), keep the
    // nprobe nearest cells
    val centDf = spark.createDataFrame(centroids.toIndexedSeq).toDF("cell", "cv")
    val q = assigned.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n").as("qn"))
    val qCells = q.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qv"), col("qn"), col("cell"),
        dot(col("qv"), col("cv")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("cell"))))
      .filter(col("rk") <= nprobe)
      .select("qid", "qv", "qn", "cell")
    val cand = assigned.as("c")
      .join(broadcast(qCells),
        col("c.cell") === qCells("cell") && col("c.vec_id") =!= col("qid"))
      .select(col("qid"), col("c.vec_id").as("cid"),
        round(dot(col("qv"), col("c.v")) / (col("qn") * col("c.n")), 6)
          .as("cos"))
      .distinct()
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    val result = cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cos"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
      // the cache is required while KMeans iterates and the probe join
      // runs, but must not outlive the call: eager-materialize the
      // small top-k result, then release
      .localCheckpoint(eager = true)
    vecs.unpersist()
    result
  }

  /** Deterministic local Lloyd's k-means for PQ codebook training:
    * centroids initialized at evenly spaced sample points (no RNG —
    * reruns are bit-identical), empty clusters keep their previous
    * centroid. Runs on a BOUNDED driver-side sample by design — the
    * FAISS convention: codebooks train on ~10⁴–10⁵ sampled vectors
    * regardless of corpus size, while encoding/scoring stay fully
    * distributed. */
  private def kmeansLocal(
      pts: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val d = pts.head.length
    var cents = Array.tabulate(k)(i => pts(i * pts.length / k).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, d)(0.0)
      val cnts = Array.fill(k)(0)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var j = 0
          while (j < d) { val t = p(j) - cents(c)(j); dist += t * t; j += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (cnts(c) == 0) cents(c)
        else Array.tabulate(d)(j => sums(c)(j) / cnts(c)))
    }
    cents
  }

  /** Train PQ codebooks: split dim into `m` subspaces, k-means each on
    * a deterministic bounded sample. Returns m × codes × (dim/m). */
  def pqCodebooks(
      embeddings: DataFrame, dim: Int, m: Int, codes: Int,
      sampleN: Int = 4096, iters: Int = 10): Array[Array[Array[Double]]] = {
    val sub = dim / m
    val sample = embeddings.orderBy("vec_id").limit(sampleN)
      .select(asDouble(col("embedding")).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty,
      "pqCodebooks: embeddings input is empty — cannot train codebooks")
    // fewer sample points than requested codes would seed duplicate
    // centroids (pts(i*n/k) repeats indices) and silently degrade the
    // codebook; clamp so every centroid seeds from a distinct point
    val k = math.min(codes, sample.length)
    Array.tabulate(m)(s =>
      kmeansLocal(sample.map(_.slice(s * sub, (s + 1) * sub)), k, iters))
  }

  /** Product-quantization ANN with asymmetric distance computation —
    * the compressed-domain scale path beyond [[ivfCosineTopK]]:
    *
    *  - every corpus vector is ENCODED as m sub-codes (argmin L2 to its
    *    subspace codebook): m·log₂(codes) bits — here 8×4 = 32 bits of
    *    state per vector instead of 64 doubles, the representation that
    *    lets a 100 TB embedding corpus live in executor memory;
    *  - each query precomputes an m × codes lookup table of exact
    *    subspace dot products (ADC), so scoring a corpus vector is m
    *    table lookups + adds — no vector arithmetic in the hot loop;
    *  - the ADC top `refine·k` candidates are re-ranked with EXACT
    *    cosine (standard PQ refinement), so returned scores are true
    *    cosines and only the candidate set is approximate.
    *
    * Everything after codebook training is pure Column expressions over
    * a broadcast query side — same plan shape as [[cosineTopK]], with
    * the corpus side carrying 8 ints instead of the full vector.
    * Recall vs exact is asserted in SimilaritySpec. */
  def pqCosineTopK(
      embeddings: DataFrame, dim: Int = 64, queryMaxId: Long = 10,
      k: Int = 5, m: Int = 16, codes: Int = 16, refine: Int = 8): DataFrame = {
    val sub = dim / m
    val books = pqCodebooks(embeddings, dim, m, codes)
    def centLit(s: Int, c: Int): Column =
      array(books(s)(c).toIndexedSeq.map(lit): _*)
    def l2sq(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)

    val base = embeddings.select(
      col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    // encode: per subspace, index of the nearest codeword (ties → first)
    val encoded = base.withColumn("pq", array((0 until m).map { s =>
      val sv = slice(col("v"), s * sub + 1, sub)
      val dists = array((0 until codes).map(c => l2sq(sv, centLit(s, c))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*))
    // query side: exact subspace-dot lookup tables (m × codes doubles)
    val q = base.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n").as("qn"))
      .withColumn("lut", array((0 until m).map { s =>
        val qs = slice(col("qv"), s * sub + 1, sub)
        array((0 until codes).map(c => dot(qs, centLit(s, c))): _*)
      }: _*))
      .select("qid", "qn", "lut")
    val adc = encoded.select(col("vec_id").as("cid"), col("n").as("cn"),
        col("pq"))
      .join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("qn"), col("cid"), col("cn"),
        aggregate(
          zip_with(col("pq"), col("lut"), (c, l) => element_at(l, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("adc_dot"))
      .select(col("qid"), col("cid"),
        (col("adc_dot") / (col("qn") * col("cn"))).as("approx_cos"))
    val wAdc = Window.partitionBy("qid")
      .orderBy(col("approx_cos").desc, col("cid").asc)
    val cand = adc.withColumn("ark", row_number().over(wAdc))
      .filter(col("ark") <= refine * k)
      .select("qid", "cid")
    // exact re-rank of the small candidate set
    val wX = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    cand
      .join(base.select(col("vec_id").as("cid"), col("v").as("cv"),
        col("n").as("cn2")), "cid")
      .join(broadcast(base.filter(col("vec_id") < queryMaxId)
        .select(col("vec_id").as("qid"), col("v").as("qv2"),
          col("n").as("qn2"))), "qid")
      .select(col("qid"), col("cid"),
        round(dot(col("qv2"), col("cv")) / (col("qn2") * col("cn2")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(wX))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cos"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  /** Embedding-cosine near-duplicate pairs (X1's embedding flavor):
    * all pairs with cosine ≥ minCos among LSH band collisions —
    * near-dup detection without the |corpus|² cross join. */
  def embeddingNearDups(
      embeddings: DataFrame, dim: Int = 64, minCos: Double = 0.95,
      bits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = bits / bands
    val mask = (1L << rows) - 1
    val sig = embeddings.select(
      col("vec_id"), asDouble(col("embedding")).as("v"),
      hyperplaneSig(asDouble(col("embedding")), dim, bits).as("sig"))
      .withColumn("n", norm(col("v")))
    val banded = sig.select(
      col("vec_id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rows).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bkey")))
    // cos is a pure function of the pair, so computing it BEFORE the
    // multi-band dedup means the distinct exchange carries (id, id,
    // cos) — 24 bytes — instead of the two 64-double vectors (~1 KB)
    // per candidate row (guide-§2.3 "project before the exchange";
    // duplicate band collisions recompute one dot product each, far
    // cheaper than shuffling their payloads)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_i"), col("b.vec_id").as("vec_j"),
        round(dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), 6)
          .as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
      .orderBy("vec_i", "vec_j")
  }

  /** One band's bucket key (rows bits) from the deterministic xxhash64
    * hyperplanes — per-band columns instead of one packed long, so the
    * total bit budget is NOT capped at 64 (the adaptive path can need
    * rows × bands > 64). */
  private def bandKey(v: Column, dim: Int, band: Int, rows: Int): Column =
    (0 until rows).map { i =>
      val plane = band * rows + i
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * when(pmod(xxhash64(lit(plane), j), lit(2)) === 0,
            1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Density-adaptive LSH granularity: rows-per-band keeps EXPECTED
    * bucket occupancy ≤ `targetOccupancy` (candidate pairs ~linear in
    * corpus size instead of quadratic-in-occupancy), bands deliver
    * `targetRecall` for pairs at cosine ≥ `minCos` under the
    * random-hyperplane collision model p = 1 − acos(cos)/π. Pure
    * arithmetic — unit-tested directly in SimilaritySpec. */
  def adaptiveLshParams(
      n: Long, minCos: Double, targetOccupancy: Long = 128,
      targetRecall: Double = 0.9): (Int, Int) = {
    val rows = math.max(1, math.min(24, math.ceil(
      math.log(math.max(n, 1L).toDouble / targetOccupancy) /
        math.log(2.0)).toInt))
    val p = 1.0 - math.acos(math.max(-1.0, math.min(minCos, 1.0))) / math.Pi
    val missPerBand = 1.0 - math.pow(p, rows)
    val bands =
      if (missPerBand <= 0.0) 1 // p = 1: every band collides, one is enough
      else if (missPerBand >= 1.0) 16 // p = 0: no band count reaches the
      // recall target — saturate at the cap instead of Int.MinValue→1
      else math.max(1, math.min(16, math.ceil(
        math.log(1.0 - targetRecall) / math.log(missPerBand)).toInt))
    (rows, bands)
  }

  /** Embedding near-dup pairs with DENSITY-ADAPTIVE LSH — the 100 TB
    * default. The fixed-granularity operators above ([[embeddingNearDups]],
    * [[embeddingNearDupsPortable]]) keep 2⁴ buckets per band for oracle
    * portability, so bucket occupancy grows with the corpus and the
    * candidate-pair volume quadratically (measured 25× wall-clock for
    * 10× vectors in the sf1 rehearsal, BASELINE.md). This variant
    * spends one `count()` to size the bucket space: occupancy stays
    * ≤ targetOccupancy regardless of corpus size, so candidates grow
    * linearly; band count is derived from the recall target at the
    * cosine threshold. Everything downstream is the same bucketed
    * equi-join + exact-cosine verify. */
  def embeddingNearDupsAdaptive(
      embeddings: DataFrame, dim: Int = 64, minCos: Double = 0.95,
      targetOccupancy: Long = 128, targetRecall: Double = 0.9): DataFrame = {
    val n = embeddings.count()
    val (rows, bands) = adaptiveLshParams(
      n, minCos, targetOccupancy, targetRecall)
    val sig = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    // checkpoint: the banded frame feeds BOTH sides of the self-join,
    // and the bands × rows × dim hyperplane aggregates are the
    // expensive part — evaluate them once (the GlobalRank multi-
    // consumer discipline; blocks reclaimed by the ContextCleaner)
    val banded = sig.select(
      col("vec_id"), col("v"), col("n"),
      posexplode(array((0 until bands).map(b =>
        bandKey(col("v"), dim, b, rows)): _*))
        .as(Seq("band", "bkey")))
      .localCheckpoint(true)
    // cos is a pure function of the pair, so computing it BEFORE the
    // multi-band dedup means the distinct exchange carries (id, id,
    // cos) — 24 bytes — instead of the two 64-double vectors (~1 KB)
    // per candidate row (guide-§2.3 "project before the exchange";
    // duplicate band collisions recompute one dot product each, far
    // cheaper than shuffling their payloads)
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_i"), col("b.vec_id").as("vec_j"),
        round(dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")), 6)
          .as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
      .orderBy("vec_i", "vec_j")
  }

  /** SemDeDup (Abbas et al. 2023) semantic deduplication — the
    * ENGINE-RECOMMENDED entry point, routed through the density-
    * adaptive LSH ([[embeddingNearDupsAdaptive]]): bucket occupancy is
    * held ≤ targetOccupancy regardless of corpus size, so candidate
    * pairs — and therefore the whole pass — grow ~linearly where the
    * fixed-granularity form measured 25× wall-clock for 10× vectors
    * (BASELINE.md sf1 table). Pairs are closed transitively with the
    * diameter-independent star components; each cluster keeps its min
    * vec_id. Output is the DROP LIST — (vec_id, kept_id) for every
    * vector a semantic-dedup pass removes. Every stage is a bucketed
    * equi-join; the corpus is never compared all-pairs. */
  def semanticDedup(
      embeddings: DataFrame, minCos: Double = 0.4, dim: Int = 64,
      targetOccupancy: Long = 128, targetRecall: Double = 0.9): DataFrame = {
    val pairs = embeddingNearDupsAdaptive(
      embeddings, dim, minCos, targetOccupancy, targetRecall)
      .select(col("vec_i").as("doc_i"), col("vec_j").as("doc_j"))
    semanticDropList(pairs)
  }

  /** q100 — the ORACLE TWIN of [[semanticDedup]]: identical cluster/
    * drop-list semantics, but pairs come from the fixed-granularity
    * engine-portable LSH ([[embeddingNearDupsPortable]], q35 contract)
    * so the DuckDB oracle can replay the exact candidate set. Kept
    * SOLELY for that contract — fixed 4-band/4-bit granularity goes
    * super-linear as corpus density rises; new callers should use
    * [[semanticDedup]] (density-adaptive, ~linear candidates). */
  def semanticDedupPortable(
      embeddings: DataFrame, minCos: Double = 0.4): DataFrame = {
    val pairs = embeddingNearDupsPortable(embeddings, minCos = minCos)
      .select(col("vec_i").as("doc_i"), col("vec_j").as("doc_j"))
    semanticDropList(pairs)
  }

  /** Shared SemDeDup tail: transitive closure via star components,
    * min-id canonical per cluster, (vec_id, kept_id) drop list. */
  private def semanticDropList(pairs: DataFrame): DataFrame =
    Dedup.connectedComponentsStar(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("vec_id"), col("component").as("kept_id"))
      .orderBy("vec_id")

  /** q148 — embedding dimension correlation matrix: Pearson corr for
    * every dimension pair (i < j) of the embedding space — the
    * redundant-dimension / whitening diagnostic an embedding pipeline
    * runs before PCA or product quantization (highly correlated dims
    * waste index bits; PQ subspace splits want decorrelated blocks).
    *
    * Scale design — ONE pass through the custom
    * [[graft.functions.MomentMatrixAggregator]]: every partition
    * accumulates n / Σx / the full upper-triangle Σxᵢxⱼ in a local
    * d(d+1)/2-double buffer (tight multiply-add loop, no per-pair row
    * materialization), merges are elementwise array adds with map-side
    * partial aggregation, and the whole corpus shuffles ONE ~17 KB
    * buffer per partition. A 10⁹-vector corpus pays one linear scan
    * and shuffles kilobytes; the pair frame only exists AFTER the
    * aggregate, at d²/2 rows. (The same result as a d²-key explode +
    * hash agg, measured 7.5× faster at sf1.)
    *
    * Determinism: float32 inputs widen to double EXACTLY on both
    * engines before multiplying; per-buffer sums differ only in
    * addition order → 4-decimal rounding of the final ratio, the
    * repo's float-output discipline. */
  def dimCorrelation(embeddings: DataFrame): DataFrame = {
    val moment = udaf(new graft.functions.MomentMatrixAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val one = embeddings.agg(moment(col("embedding")).as("m"))
    val mu = (a: Column, idx: Column) =>
      element_at(a, idx + 1) / col("n")
    one.select(col("m.n").as("n"), col("m.sums").as("s"),
        col("m.diag").as("dg"), explode(col("m.pairs")).as("t"))
      .select(col("t.i").as("dim_i"), col("t.j").as("dim_j"),
        (col("t.sxy") / col("n")).as("exy"),
        mu(col("s"), col("t.i")).as("mu_i"),
        mu(col("s"), col("t.j")).as("mu_j"),
        (element_at(col("dg"), col("t.i") + 1) / col("n")).as("exx_i"),
        (element_at(col("dg"), col("t.j") + 1) / col("n")).as("exx_j"))
      .select(col("dim_i"), col("dim_j"),
        // + 0.0 folds IEEE negative zero (a -1e-5 that rounds to -0.0)
        // into +0.0 — mirrored in the oracle
        (round((col("exy") - col("mu_i") * col("mu_j")) /
          sqrt((col("exx_i") - col("mu_i") * col("mu_i")) *
            (col("exx_j") - col("mu_j") * col("mu_j"))), 4) + lit(0.0))
          .as("corr"))
      .orderBy("dim_i", "dim_j")
  }

  // ---- q162: int8 scalar-quantized cosine (SQ8) --------------------

  /** Symmetric per-vector int8 scalar quantization: scale = max|v_i| /
    * 127, code_i = floor(v_i/scale + 0.5) ∈ [-127, 127] — the FAISS
    * ScalarQuantizer(QT_8bit) idea. 4× (vs float32) less candidate
    * data to scan/shuffle, and the inner loop becomes integer
    * multiply-adds.
    *
    * The property the oracle gate leans on: under SYMMETRIC per-
    * vector scaling the cosine of the quantized vectors is scale-free
    * — cos_q = Σqa·qb / (√Σqa² · √Σqb²), pure exact-integer sums
    * under IEEE sqrt/divide — so both engines derive bit-identical
    * scores with no float-accumulation-order hazard at all (stronger
    * than the float path, which needs 6-decimal rounding for safety).
    *
    * `floor(x + 0.5)` rather than `round`: engines disagree on
    * negative-half rounding (HALF_UP vs away-from-zero); floor+0.5 is
    * one deterministic rule everywhere. */
  def sq8Codes(v: Column): Column = {
    val scale = greatest(array_max(transform(v, x => abs(x))),
      lit(1e-12)) / lit(127.0)
    transform(v, x => floor(x / scale + lit(0.5)).cast("long"))
  }

  /** q162 — SQ8 cosine top-k: same contract as [[cosineTopK]] but
    * scored on int8 codes. Scale: identical plan shape to q26
    * (broadcast query side, per-partition scoring, per-query top-k
    * window) — the quantization is a narrow map that SHRINKS the
    * scanned bytes 4×; at 100 TB the candidate side streams codes,
    * not floats, and the exact-rescore of the top-k' survivors (the
    * standard two-stage ANN) touches float vectors for only
    * k' · |queries| rows. SimilaritySpec measures recall@k vs the
    * exact float path. */
  def sq8CosineTopK(
      embeddings: DataFrame, queryMaxId: Long = 10,
      k: Int = 5): DataFrame = {
    // codes ride as ARRAY<DOUBLE> so the scoring loop is the fused
    // native vec_dot expression (one codegen'd primitive loop, no
    // per-pair intermediate array) — every product and running sum
    // stays < 2^53, so double arithmetic here IS exact integer
    // arithmetic and the oracle's BIGINT formulation matches
    // bit-for-bit
    import graft.functions.VectorFunctions.vec_dot
    val base = embeddings
      .select(col("vec_id"),
        sq8Codes(asDouble(col("embedding")))
          .cast("array<double>").as("qc"))
      .withColumn("d2", vec_dot(col("qc"), col("qc")))
      .filter(col("d2") > 0.0)
    val q = base.select(col("vec_id").as("qid"), col("qc").as("qa"),
      col("d2").as("da")).filter(col("qid") < queryMaxId)
    val c = base.select(col("vec_id").as("cid"), col("qc").as("qb"),
      col("d2").as("db"))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(
          vec_dot(col("qa"), col("qb")) /
            (sqrt(col("da")) * sqrt(col("db"))), 6).as("cos_q"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_q").desc, col("cid").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cos_q"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
  }

  /** The composed 100 TB ANN path the q83/q162 scaladocs promise —
    * IVF coarse quantization bounds WHICH vectors are scored (nprobe
    * cells instead of the corpus), SQ8 bounds WHAT the scoring reads
    * (int8 codes, 4× less than floats), and the classic two-stage
    * finish rescores the k·`oversample` quantized survivors with
    * exact float cosine so the output scores carry no quantization
    * error — only the CANDIDATE CHOICE is approximate (the FAISS
    * IVF+SQ design). Seeded KMeans ⇒ rows-only gate (q83 precedent);
    * SimilaritySpec measures recall vs brute force. */
  def ivfSq8TopK(
      embeddings: DataFrame, queryMaxId: Long = 10, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, oversample: Int = 4): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import graft.functions.VectorFunctions.vec_dot

    val vecs = embeddings.select(
      col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("qc", sq8Codes(col("v")).cast("array<double>"))
      .withColumn("d2", vec_dot(col("qc"), col("qc")))
      .filter(col("d2") > 0.0)
      .withColumn("features", array_to_vector(col("v")))
      .cache()
    val model = new KMeans().setK(nlist).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("cell").fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("v"), col("n"), col("qc"),
        col("d2"), col("cell"))
    val centDf = spark.createDataFrame(
      model.clusterCenters.zipWithIndex
        .map { case (c, i) => (i, c.toArray) }.toIndexedSeq)
      .toDF("cell", "cv")
    val q = assigned.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("n").as("qn"), col("qc").as("qqc"), col("d2").as("qd2"))
    val qCells = q.crossJoin(broadcast(centDf))
      .select(col("qid"), col("qv"), col("qn"), col("qqc"),
        col("qd2"), col("cell"),
        dot(col("qv"), col("cv")).as("sim"))
      .withColumn("pr", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("cell"))))
      .filter(col("pr") <= nprobe)
      .select("qid", "qv", "qn", "qqc", "qd2", "cell")
    // stage 1: quantized scoring over the probed cells only
    val cand = assigned.as("c")
      .join(broadcast(qCells),
        col("c.cell") === qCells("cell") && col("c.vec_id") =!= col("qid"))
      .select(col("qid"), col("qv"), col("qn"),
        col("c.vec_id").as("cid"), col("c.v").as("cv2"),
        col("c.n").as("cn"),
        (vec_dot(col("qqc"), col("c.qc")) /
          (sqrt(col("qd2")) * sqrt(col("c.d2")))).as("approx"))
      .distinct()
    val wApprox = Window.partitionBy("qid")
      .orderBy(col("approx").desc, col("cid").asc)
    val shortlist = cand.withColumn("ar", row_number().over(wApprox))
      .filter(col("ar") <= k * oversample)
    // stage 2: exact rescore of the shortlist, final top-k
    val wExact = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    val result = shortlist
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv2")) / (col("qn") * col("cn")), 6)
          .as("cos"))
      .withColumn("rk", row_number().over(wExact))
      .filter(col("rk") <= k)
      .select(col("qid"), col("cid"), col("cos"),
        col("rk").cast("long").as("rk"))
      .orderBy("qid", "rk")
      .localCheckpoint(eager = true)
    vecs.unpersist()
    result
  }

  /** q171 — PCA-rotated SQ8 ANN: the FAISS PCAR/OPQ-lite
    * preprocessing [[Pca]]'s scaladoc promises, composed with q162's
    * int8 scoring. Project every vector onto the top `dims` principal
    * axes (ONE moment-matrix pass + a broadcast rotation riding the
    * scan), then quantize and score the PROJECTED vectors — at 100 TB
    * the candidate side shrinks another dims/d on top of SQ8's 4×,
    * and on real embedding corpora (variance concentrated in few
    * directions) the rotation loses almost nothing. Candidate choice
    * is approximate (rotation truncation + quantization); PcaSpec
    * measures recall against exact original-space cosine on planted
    * low-rank data, where the truncation is provably near-lossless.
    * Rows-only gate (iterative eigensolve + float scores). */
  def pcaSq8TopK(
      embeddings: DataFrame, dims: Int = 32, queryMaxId: Long = 10,
      k: Int = 5): DataFrame = {
    val m = Pca.fit(embeddings, dims)
    val proj = Pca.project(embeddings, m)
    val arr = array(
      (0 until m.k).map(j => col(s"pc_$j").cast("float")): _*)
    sq8CosineTopK(
      proj.select(col("vec_id"), arr.as("embedding")), queryMaxId, k)
  }

  /** q189 — reciprocal-rank-fusion hybrid retrieval: the standard way
    * modern search stacks combine heterogeneous rankers (dense +
    * quantized here; dense + BM25 in a text stack) without score
    * calibration — RRF(d) = Σ_r 1/(K + rank_r(d)) over the rankings
    * that surface d, K = 60 (Cormack et al.'s constant). Fuses the
    * EXACT cosine ranking with the SQ8 quantized ranking, both taken
    * to `depth`, via one full-outer join on (qid, cid) — per-query
    * frames are ≤ 2·depth rows after the join, so the fusion window
    * is bounded by construction no matter the corpus size; the
    * upstream rankers carry the scale posture. Ranks are exact
    * integers (absent-from-a-list reported as 0), the fused score is
    * rounded to 6 dp BEFORE ranking so tie resolution (cid asc) is
    * engine-portable. */
  def rrfFusion(
      embeddings: DataFrame, queryMaxId: Long = 10, depth: Int = 20,
      k: Int = 10, kRrf: Int = 60): DataFrame = {
    val a = cosineTopK(embeddings, queryMaxId, depth)
      .select(col("qid"), col("cid"), col("rk").as("rk_exact"))
    val b = sq8CosineTopK(embeddings, queryMaxId, depth)
      .select(col("qid"), col("cid"), col("rk").as("rk_sq8"))
    val fused = a.join(b, Seq("qid", "cid"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(kRrf) + col("rk_exact")), lit(0.0))
          + coalesce(lit(1.0) / (lit(kRrf) + col("rk_sq8")), lit(0.0)),
        6))
    val w = Window.partitionBy("qid")
      .orderBy(col("rrf").desc, col("cid").asc)
    fused.withColumn("frk", row_number().over(w))
      .filter(col("frk") <= k)
      .select(col("qid"), col("cid"), col("rrf"),
        coalesce(col("rk_exact"), lit(0L)).as("rk_exact"),
        coalesce(col("rk_sq8"), lit(0L)).as("rk_sq8"),
        col("frk").cast("long").as("frk"))
      .orderBy("qid", "frk")
  }

  /** q190 — hard-negative mining: the training-data step behind every
    * contrastive retriever/reranker (DPR/SBERT-style): for each query
    * in the bounded panel, the `k` highest-cosine candidates whose
    * label DIFFERS from the query's (label = ground-truth relevance,
    * the q186 convention) — the negatives a bi-encoder most needs to
    * see — each with its negative rank, cosine, the query's best
    * POSITIVE cosine, and the margin (best positive − negative;
    * negative margin ⇒ the ranker currently prefers a wrong answer —
    * the "hardest" class).
    *
    * Shape: one broadcast of the bounded query panel against the
    * candidate scan (the [[cosineTopK]] posture), ONE extra aggregate
    * for the per-query best positive (|Q| rows, broadcast back), and
    * the per-query negative rank over the same bounded-panel window.
    * Scores are rounded to 6 dp BEFORE ranking and the margin is a
    * difference of two rounded values re-rounded — deterministic,
    * hence the full hash oracle. Queries with no positive at all
    * report best_pos_cos = −1 (worse than any cosine, so margins
    * stay well-defined). */
  def hardNegatives(
      embeddings: DataFrame, queryMaxId: Long = 10,
      k: Int = 10): DataFrame = {
    val q = embeddings.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"),
        col("label").cast("long").as("q_label"))
      .withColumn("qn", norm(col("qv")))
    val c = embeddings
      .select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"),
        col("label").cast("long").as("c_label"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
      .select(col("qid"), col("q_label"), col("cid"), col("c_label"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("cos"))
    val bestPos = scored.filter(col("c_label") === col("q_label"))
      .groupBy("qid").agg(max("cos").as("bp"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("cid").asc)
    scored.filter(col("c_label") =!= col("q_label"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .join(broadcast(bestPos), Seq("qid"), "left")
      .withColumn("best_pos_cos", coalesce(col("bp"), lit(-1.0)))
      .select(col("qid"), col("cid"), col("cos"),
        col("rk").cast("long").as("neg_rank"),
        col("best_pos_cos"),
        round(col("best_pos_cos") - col("cos"), 6).as("margin"))
      .orderBy("qid", "neg_rank")
  }

  /** q186 — retrieval-quality evaluation suite: the standard IR/RAG
    * metrics (hit count, precision@k, recall@k, MRR, NDCG@k) for a
    * bounded query panel against the full corpus, with the fixture's
    * `label` column as binary ground-truth relevance (relevant ⇔ same
    * label, the ANN-benchmark convention). Rides [[cosineTopK]]'s
    * exact ranked frame unchanged — same rounded-cosine scores, same
    * deterministic (cos DESC, cid) tiebreak — so the eval and the
    * retrieval it grades can never disagree about ranking.
    *
    * Every metric is computed distributively from that k·|Q| frame:
    * hits/first-relevant-rank/DCG in one groupBy, relevant-set sizes
    * from one label-count aggregate (broadcast — label cardinality is
    * fixed), and the IDCG normalizer from a k×k Range self-join
    * (no window at all, and nothing driver-side). At 100 TB the eval
    * panel is bounded by construction (queryMaxId) while the candidate
    * scan stays one distributed pass — swap [[cosineTopK]] for
    * [[ivfSq8TopK]] to grade the approximate index with the same
    * metric frame. NDCG uses binary gains: DCG = Σ rel/log2(rank+1),
    * IDCG = Σ_{i≤min(n_rel,k)} 1/log2(i+1); ranks and hits are exact
    * integers, ratios rounded to 6 dp for cross-engine hashing. */
  def retrievalEval(
      embeddings: DataFrame, queryMaxId: Long = 10,
      k: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    val labels = embeddings.select(
      col("vec_id"), col("label").cast("long").as("label"))
    // |relevant(q)| = count(label(q)) - 1: the query never counts as
    // its own candidate (cosineTopK excludes qid = cid)
    val labelCounts = labels.groupBy("label")
      .agg(count(lit(1)).as("n_label"))
    val perQuery = cosineTopK(embeddings, queryMaxId, k)
      .join(labels.select(
        col("vec_id").as("qid"), col("label").as("q_label")), Seq("qid"))
      .join(labels.select(
        col("vec_id").as("cid"), col("label").as("c_label")), Seq("cid"))
      .withColumn("rel",
        when(col("q_label") === col("c_label"), 1L).otherwise(0L))
      .groupBy("qid", "q_label")
      .agg(
        sum("rel").as("hits"),
        min(when(col("rel") === 1L, col("rk"))).as("first_rel_rk"),
        sum(when(col("rel") === 1L,
          lit(1.0) / log2(col("rk") + 1)).otherwise(lit(0.0))).as("dcg"))
    // IDCG table for m = 1..k via a Range self-join aggregate — no
    // unpartitioned window, k² literal-bounded rows
    val r = spark.range(1, k + 1L).select(col("id"))
    val idcgTable = r.as("m").join(r.as("i"), col("i.id") <= col("m.id"))
      .groupBy(col("m.id").as("m"))
      .agg(sum(lit(1.0) / log2(col("i.id") + 1)).as("idcg"))
    perQuery
      .join(broadcast(labelCounts), col("q_label") === col("label"))
      .withColumn("n_rel", col("n_label") - 1)
      .join(broadcast(idcgTable),
        least(col("n_rel"), lit(k.toLong)) === col("m"), "left")
      .select(
        col("qid"), col("n_rel"), col("hits"),
        round(col("hits").cast("double") / k, 6).as("precision_k"),
        when(col("n_rel") > 0,
          round(col("hits").cast("double") / col("n_rel"), 6))
          .otherwise(lit(0.0)).as("recall_k"),
        when(col("first_rel_rk").isNotNull,
          round(lit(1.0) / col("first_rel_rk"), 6))
          .otherwise(lit(0.0)).as("mrr"),
        when(col("idcg").isNotNull, round(col("dcg") / col("idcg"), 6))
          .otherwise(lit(0.0)).as("ndcg_k"))
      .orderBy("qid")
  }

  /** q230 — Matryoshka dimension-truncation recall audit: for each
    * query vector, the overlap between the exact top-`k` under FULL
    * 64-dim cosine and the top-`k` under the first `dims` dimensions
    * only — the offline audit behind the biggest storage/IO lever a
    * 100 TB vector corpus has (truncating 64→16 dims reads ¼ the
    * bytes in the first-stage scan; MRL-trained embeddings keep
    * recall high, arbitrary embeddings don't — this table is how you
    * find out which you have, per corpus, before flipping the
    * two-stage switch). The production serving path is the existing
    * IVF/SQ8 two-stage family; this is its calibration table.
    *
    * Ranking on both arms follows q26's discipline exactly: cosine
    * ROUNDED to 6 dp, cid tie-break — so each arm's top-k set is the
    * gate-proven reproducible kind, and the overlap/flag outputs are
    * pure integers.
    *
    * Scale: both arms broadcast the |queries|-row side against the
    * candidate scan (the q26 shape); the truncated arm's scoring
    * touches `dims/64` of the vector bytes, which is the point. */
  def matryoshkaRecall(
      embeddings: DataFrame,
      dims: Int = 16,
      k: Int = 5,
      queryMaxId: Long = 50): DataFrame = {
    def topk(sliceDims: Option[Int], rkName: String): DataFrame = {
      val proj: Column => Column = sliceDims match {
        case Some(d) => v => asDouble(slice(v, 1, d))
        case None => v => asDouble(v)
      }
      val q = embeddings.filter(col("vec_id") < queryMaxId)
        .select(col("vec_id").as("qid"), proj(col("embedding")).as("qv"))
        .withColumn("qn", norm(col("qv")))
      val c = embeddings
        .select(col("vec_id").as("cid"), proj(col("embedding")).as("cv"))
        .withColumn("cn", norm(col("cv")))
      // zero-norm guard: a vector whose first `dims` entries are all
      // zero would make 0/0 = NaN, and Spark ranks NaN ABOVE every
      // real cosine in the desc sort (seizing top-k slots) while
      // DuckDB's NULL-from-0/0 sorts last — pin both engines to the
      // same well-defined floor instead
      val scored = c.join(broadcast(q), col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          when(col("qn") > 0 && col("cn") > 0,
            round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
            .otherwise(lit(-1.0)).as("cos"))
      val w = Window.partitionBy("qid")
        .orderBy(col("cos").desc, col("cid").asc)
      scored.withColumn(rkName, row_number().over(w).cast("long"))
        .filter(col(rkName) <= k)
        .select(col("qid"), col("cid"), col(rkName))
    }
    val full = topk(None, "rk_full")
    val trunc = topk(Some(dims), "rk_trunc")
    val overlap = full.join(trunc, Seq("qid", "cid"))
      .groupBy("qid").agg(count(lit(1)).as("overlap"),
        sum(when(col("rk_full") === 1 && col("rk_trunc") === 1, 1L)
          .otherwise(0L)).as("top1_match"))
    full.groupBy("qid").agg(count(lit(1)).as("n_full"))
      .join(overlap, Seq("qid"), "left")
      .select(col("qid"), col("n_full"),
        coalesce(col("overlap"), lit(0L)).as("overlap"),
        coalesce(col("top1_match"), lit(0L)).as("top1_match"),
        round(coalesce(col("overlap"), lit(0L)).cast("double")
          / col("n_full").cast("double"), 4).as("recall_k"))
      .orderBy("qid")
  }
}
