package graft.operators

import graft.Tables
import graft.functions.{MomentMatrixAggregator, VectorFunctions}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed PCA over the embedding corpus — the dimensionality-
  * reduction / whitening step that sits between q148's dimension-
  * correlation diagnostic and the PQ/IVF index builds (the public
  * recipe: center, rotate onto the top-k principal axes, optionally
  * whiten — FAISS's OPQ/PCAR preprocessing, Sánchez et al.'s
  * Fisher-vector pipeline, every embedding-dedup paper's first step).
  *
  * Scale shape (the whole point): the corpus-side cost is ONE pass
  * through [[MomentMatrixAggregator]] — each partition folds its
  * vectors into a d(d+1)/2-double buffer (~17 KB at d=64), partials
  * merge map-side, and exactly one tiny buffer per partition crosses
  * the wire. The d×d eigenproblem then solves on the DRIVER in
  * microseconds (d ≤ a few hundred for any embedding column; the
  * driver never sees a single vector). Projection broadcasts k
  * d-double rows as literal arrays and rides the scan through the
  * native codegen'd [[graft.functions.VectorDot]] — no shuffle, no
  * UDF, embarrassingly parallel at 100 TB.
  *
  * Determinism: the eigensolver is a fixed-sweep cyclic Jacobi with
  * no RNG and a canonical sign fix (largest-|loading| coordinate made
  * positive), so fit → project is bitwise reproducible for a given
  * partition-merge order; across partitionings results differ only by
  * float-addition order in the moment sums (the q148 discipline).
  * Scores are floats → the declared query is rows-only; the REAL gate
  * is PcaSpec: planted-subspace recovery, eigenpair residuals
  * ‖Cv−λv‖, orthonormality, Σλ = trace, and projection-vs-local
  * equality.
  */
object Pca {

  /** Fitted model: `mean` (d), `eigenvalues` ALL d in descending
    * order (so explained-variance ratios don't need a second pass),
    * `components` the top k unit eigenvectors (k × d, row-major). */
  case class Model(n: Long, mean: Array[Double],
      eigenvalues: Array[Double], components: Array[Array[Double]]) {
    def d: Int = mean.length
    def k: Int = components.length
    def explainedVariance: Array[Double] = {
      // The one-pass E[x²] − mean² covariance can cancel catastrophically
      // when ‖mean‖ ≫ spread and emit slightly NEGATIVE eigenvalues;
      // clamp at 0 (as whiten already does) so the ratios stay in [0,1].
      val clamped = eigenvalues.map(math.max(_, 0.0))
      val tot = clamped.sum
      clamped.take(k).map(v => if (tot == 0.0) 0.0 else v / tot)
    }
  }

  /** One-pass covariance fit + driver-side eigensolve. The aggregate
    * is the only distributed work; everything after runs on d×d
    * driver-local arrays. */
  def fit(embeddings: DataFrame, k: Int,
      vecCol: String = "embedding"): Model = {
    val moment = udaf(new MomentMatrixAggregator,
      ExpressionEncoder[Seq[Float]]())
    val r = embeddings
      .agg(moment(col(vecCol)).as("m"))
      .select(col("m.n"), col("m.sums"), col("m.diag"),
        col("m.pairs"))
      .head()
    modelFromMoments(
      r.getLong(0), r.getSeq[Double](1).toArray,
      r.getSeq[Double](2).toArray,
      r.getSeq[org.apache.spark.sql.Row](3)
        .map(p => (p.getInt(0), p.getInt(1), p.getDouble(2))), k)
  }

  /** Driver-side eigensolve from accumulated raw moments — shared by
    * [[fit]] (one-shot aggregate) and the stream-maintained
    * [[graft.sources.MomentLedger]] (persisted running sums): the
    * moment sums are ASSOCIATIVE state, so a model built off ledger
    * state is the model of the whole history. */
  private[graft] def modelFromMoments(
      n: Long, sums: Array[Double], diag: Array[Double],
      pairs: Seq[(Int, Int, Double)], k: Int): Model = {
    require(n > 1, s"PCA needs >1 vectors, got $n")
    val d = sums.length
    val cov = Array.ofDim[Double](d, d)
    val mean = sums.map(_ / n)
    var i = 0
    while (i < d) {
      cov(i)(i) = diag(i) / n - mean(i) * mean(i)
      i += 1
    }
    pairs.foreach { case (pi, pj, sxy) =>
      val c = sxy / n - mean(pi) * mean(pj)
      cov(pi)(pj) = c; cov(pj)(pi) = c
    }
    val (evals, evecs) = jacobiEigSym(cov)
    val kk = math.min(k, d)
    Model(n, mean, evals, evecs.take(kk))
  }

  /** Project every vector onto the model's top-k axes: score_j =
    * v·c_j − mean·c_j. The per-component mean offset folds to a
    * literal, so each score is ONE fused vec_dot over the scan.
    * `whiten=true` additionally divides by √λ_j (unit-variance
    * scores — the OPQ/ZCA convention), skipping axes with λ ≤ 0. */
  def project(embeddings: DataFrame, m: Model,
      vecCol: String = "embedding", whiten: Boolean = false,
      keep: Seq[String] = Seq("vec_id")): DataFrame = {
    val emb = col(vecCol).cast("array<double>")
    val scoreCols: Seq[Column] = m.components.zipWithIndex.map {
      case (c, j) =>
        val raw = VectorFunctions.vec_dot(emb, typedlit(c.toSeq)) -
          lit(dotLocal(m.mean, c))
        val s =
          if (whiten && m.eigenvalues(j) > 0.0)
            raw / lit(math.sqrt(m.eigenvalues(j)))
          else raw
        s.as(s"pc_$j")
    }
    embeddings.select(keep.map(col) ++ scoreCols: _*)
  }

  /** ml_pca_proj — fit k=8 on the embeddings table, emit each
    * vector's PC scores (rounded for display stability) plus the
    * per-component explained-variance row the analyst reads first.
    * Float/iterative → rows-only gate; PcaSpec is the real gate. */
  def mlPcaProj(t: Tables, k: Int = 8): DataFrame = {
    val m = fit(t.embeddings, k)
    val evr = m.explainedVariance
    project(t.embeddings, m)
      .select(col("vec_id") +:
        (0 until m.k).map(j => round(col(s"pc_$j"), 4).as(s"pc_$j")): _*)
      .withColumn("evr_top_k", lit(math.rint(evr.sum * 1e4) / 1e4))
      .orderBy("vec_id")
  }

  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * (fixed sweep order, no RNG, convergence by off-diagonal norm),
    * O(d³) per sweep, and d is an embedding width, so the driver cost
    * is noise. Returns (eigenvalues desc, eigenvectors as rows, unit
    * norm, sign-canonicalized: the largest-|coordinate| entry is
    * positive, ties to the lowest index). */
  private[graft] def jacobiEigSym(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    // v starts as identity; rows of the RETURNED matrix are
    // eigenvectors, so accumulate column rotations into v's columns
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    val maxSweeps = 64
    var off = offDiagNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // smaller-magnitude root of t² + 2θt − 1 = 0 (the stable
            // choice); θ = 0 degenerates to t = 1 (45° rotation)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            rotate(a, v, p, q, c, s, d)
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // canonical sign: make the largest-|entry| coordinate positive
      val m = col.indices.maxBy(j => (math.abs(col(j)), -j))
      if (col(m) < 0.0) col.map(x => -x) else col
    }.toArray
    (evals, evecs)
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int, c: Double, s: Double, d: Int): Unit = {
    var i = 0
    while (i < d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
      i += 1
    }
    i = 0
    while (i < d) {
      val api = a(p)(i); val aqi = a(q)(i)
      a(p)(i) = c * api - s * aqi
      a(q)(i) = s * api + c * aqi
      i += 1
    }
    i = 0
    while (i < d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
      i += 1
    }
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (r <- a; x <- r) s += x * x
    math.sqrt(s)
  }
}
