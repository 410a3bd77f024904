package graft

import graft.operators.Pca
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real gate for the rows-only ml_pca_proj entry (the ml_als_recs
  * discipline): PCA's float scores carry no cross-engine oracle, so
  * correctness is proven structurally — planted-subspace recovery,
  * eigenpair residuals against the solver's own input, orthonormality,
  * trace conservation, projection-vs-driver equality, and bitwise
  * determinism.
  */
class PcaSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Deterministic planted-low-rank fixture: d=16 vectors living in a
    * fixed 3-dim subspace plus tiny deterministic "noise" derived from
    * the index (no RNG anywhere — specs replay bit-identically). */
  private def planted(n: Int = 400, d: Int = 16): Seq[Array[Float]] = {
    // three fixed orthogonal-ish directions with distinct variances
    val b1 = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else -1.0)
    val b2 = Array.tabulate(d)(i => if (i < d / 2) 1.0 else 1.5)
    val b3 = Array.tabulate(d)(i => math.sin(i + 1.0))
    (0 until n).map { r =>
      // deterministic pseudo-randoms in [-1, 1): golden-ratio orbits
      def u(s: Int) = 2.0 * (((r + 1) * 0.6180339887498949 * s) % 1.0) - 1.0
      val z1 = 9.0 * u(1); val z2 = 3.0 * u(2); val z3 = 1.0 * u(3)
      Array.tabulate(d) { i =>
        (z1 * b1(i) + z2 * b2(i) + z3 * b3(i) +
          1e-3 * u(i + 5)).toFloat
      }
    }
  }

  private def plantedDf(n: Int = 400, d: Int = 16) = {
    val rows = planted(n, d).zipWithIndex.map { case (v, i) =>
      Row(i.toLong, v.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
  }

  test("planted 3-dim structure: top-3 explained variance > 0.999 and " +
    "the 4th eigenvalue collapses") {
    val m = Pca.fit(plantedDf(), k = 4)
    val tot = m.eigenvalues.sum
    val top3 = m.eigenvalues.take(3).sum / tot
    assert(top3 > 0.999, s"top-3 EVR $top3")
    assert(m.eigenvalues(3) < 1e-3 * m.eigenvalues(0),
      s"rank-4 eigenvalue did not collapse: ${m.eigenvalues.toSeq}")
  }

  test("eigenpairs satisfy C v = λ v against an independently built " +
    "covariance, components are orthonormal, and Σλ = trace") {
    val data = planted(300, 12).map(_.map(_.toDouble))
    val n = data.length; val d = 12
    val mean = Array.tabulate(d)(i => data.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    val (evals, evecs) = Pca.jacobiEigSym(cov)
    // residuals
    for (k <- 0 until d) {
      val v = evecs(k)
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(
        (0 until d).map(i => math.pow(cv(i) - evals(k) * v(i), 2)).sum)
      assert(resid < 1e-8 * math.max(1.0, math.abs(evals(k))),
        s"eigenpair $k residual $resid")
    }
    // orthonormal rows
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(x => evecs(i)(x) * evecs(j)(x)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"V·V ($i,$j) = $dot")
    }
    // trace conservation + descending order
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-8 * math.abs(trace))
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
  }

  test("planted basis lies in the span of the top-3 components " +
    "(subspace recovery, not just variance mass)") {
    val m = Pca.fit(plantedDf(), k = 3)
    val d = m.d
    val dirs = Seq(
      Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else -1.0),
      Array.tabulate(d)(i => if (i < d / 2) 1.0 else 1.5),
      Array.tabulate(d)(i => math.sin(i + 1.0)))
    dirs.foreach { b =>
      val norm = math.sqrt(b.map(x => x * x).sum)
      val u = b.map(_ / norm)
      // fraction of u captured by the top-3 subspace
      val captured = m.components.map { c =>
        val dot = (0 until d).map(i => u(i) * c(i)).sum
        dot * dot
      }.sum
      assert(captured > 0.999,
        s"planted direction only $captured inside the top-3 span")
    }
  }

  test("distributed projection equals the driver-side projection and " +
    "whitened scores have ~unit variance") {
    val df = plantedDf(200, 16)
    val m = Pca.fit(df, k = 3)
    val proj = Pca.project(df, m).orderBy("vec_id").collect()
    val local = planted(200, 16)
    proj.foreach { row =>
      val id = row.getLong(0).toInt
      val v = local(id)
      for (j <- 0 until 3) {
        val want = (0 until 16)
          .map(i => (v(i) - m.mean(i)) * m.components(j)(i)).sum
        assert(math.abs(row.getDouble(1 + j) - want) < 1e-6,
          s"vec $id pc_$j: ${row.getDouble(1 + j)} vs $want")
      }
    }
    val white = Pca.project(df, m, whiten = true)
    val stats = white.agg(
      variance(col("pc_0")), variance(col("pc_1")), variance(col("pc_2")))
      .head()
    for (j <- 0 until 3) {
      val s = stats.getDouble(j)
      // population-vs-sample variance (n/(n-1)) is the only slack
      assert(math.abs(s - 1.0) < 0.02, s"whitened var pc_$j = $s")
    }
  }

  test("pcaSq8TopK recall on planted low-rank data: projecting 16 -> " +
    "4 dims before SQ8 keeps recall@5 vs exact original-space cosine") {
    val df = plantedDf(300, 16)
    val got = graft.operators.Similarity
      .pcaSq8TopK(df, dims = 4, queryMaxId = 10, k = 5)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val local = planted(300, 16).map(_.map(_.toDouble))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var num = 0.0; var da = 0.0; var db = 0.0; var i = 0
      while (i < a.length) {
        num += a(i) * b(i); da += a(i) * a(i); db += b(i) * b(i); i += 1
      }
      num / math.sqrt(da * db)
    }
    val recalls = (0 until 10).map { q =>
      val truth = local.indices.filter(_ != q)
        .sortBy(i => (-cos(local(q), local(i)), i)).take(5).toSet
      (truth intersect got(q.toLong).map(_.toInt)).size / 5.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean > 0.85, s"mean recall@5 = $mean per-query $recalls")
  }

  test("explainedVariance clamps cancellation-noise negative " +
    "eigenvalues at 0 so ratios stay in [0,1]") {
    // the one-pass E[x²] − mean² covariance can emit slightly negative
    // trailing eigenvalues when ‖mean‖ ≫ spread; the ratios must not
    // go negative or push the top-k share above 1
    val m = Pca.Model(n = 10, mean = Array(0.0, 0.0, 0.0),
      eigenvalues = Array(2.0, 1.0, -1e-12),
      components = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0),
        Array(0.0, 0.0, 1.0)))
    val evr = m.explainedVariance
    assert(evr.forall(v => v >= 0.0 && v <= 1.0), evr.toSeq.toString)
    assert(math.abs(evr.sum - 1.0) < 1e-12, evr.toSeq.toString)
  }

  test("fit is deterministic: two runs produce bitwise-equal models") {
    val df = plantedDf(150, 16).coalesce(1)
    val a = Pca.fit(df, k = 4)
    val b = Pca.fit(df, k = 4)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq ==
      b.components.map(_.toSeq).toSeq)
  }

  test("ml_pca_proj runs on the fixture: k rows per vector, EVR in " +
    "(0, 1], and the corpus-side plan is one aggregate (no shuffle of " +
    "raw vectors beyond partial aggregation)") {
    val out = Pca.mlPcaProj(tables, k = 4)
    val rows = out.collect()
    assert(rows.length == tables.embeddings.count())
    val evr = rows.head.getDouble(rows.head.length - 1)
    assert(evr > 0.0 && evr <= 1.0, s"evr_top_k = $evr")
    // fit's aggregation plan: the only exchange carries aggregate
    // buffers, never embedding rows
    val moment = udaf(new graft.functions.MomentMatrixAggregator,
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[Float]]())
    val agg = tables.embeddings.agg(moment(col("embedding")).as("m"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") ||
      plan.contains("SortAggregate"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }
}
