package graft

import graft.ml.{Features, Ranker, Recommender}
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  lazy val parsed = Features.parse(tables.events)
  lazy val sites = Features.siteList(parsed)
  lazy val fm = Features.pivotFeatures(Features.ranked(parsed), sites).cache()

  test("rank is in (0,1], max 1 per site, monotone in pageviews") {
    val r = Features.ranked(parsed)
    assert(r.filter(col("rank") <= 0 || col("rank") > 1).count() == 0)
    val perSiteMax = r.groupBy("site").agg(max("rank").as("m"))
    assert(perSiteMax.filter(col("m") =!= 1.0).count() == 0)
    // monotone: rank order matches pageviews order within site
    val viol = r.as("a").join(r.as("b"),
      col("a.site") === col("b.site")
        && col("a.pageviews") < col("b.pageviews")
        && col("a.rank") >= col("b.rank"))
    assert(viol.count() == 0)
  }

  test("feature matrix layout: id + sorted site triples, no nulls") {
    val expected = "id" +: sites.sorted.flatMap(s =>
      Seq(s"pageviews_$s", s"rank_$s", s"exists_$s"))
    assert(fm.columns.toSeq == expected)
    val nullCount = fm.select(
      fm.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).sum
    assert(nullCount == 0)
  }

  test("workData excludes the target triple, keeps exists leakage") {
    val target = sites.head
    val cols = Ranker.featureCols(sites, target)
    assert(!cols.exists(_.endsWith(s"_$target")))
    assert(cols.count(_.startsWith("exists_")) == sites.size - 1)
    val wd = Ranker.workData(fm, sites, target, exists = true)
    assert(wd.columns.toSeq == Seq("id", "label", "features"))
    // training rows are exactly the exists=1 rows
    assert(wd.count() == fm.filter(col(s"exists_$target") === 1.0).count())
  }

  test("train fits every site with a finite rmse below 0.5") {
    val models = Ranker.train(fm, sites)
    assert(models.map(_.site).toSet == sites.toSet,
      s"trained=${models.map(_.site)}")
    models.foreach(m =>
      assert(!m.rmse.isNaN && m.rmse < 0.5, s"${m.site} rmse=${m.rmse}"))
  }

  test("score matrix: union+pivot equals the reference join-chain") {
    val models = Ranker.train(fm, sites)
    val long = Ranker.scoreLong(fm, sites, models).cache()
    val a = Ranker.scoreMatrix(long, sites)
    val b = Ranker.scoreMatrixJoinChain(long, sites)
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq)
    val aCanon = a.select(a.columns.sorted.map(col): _*)
    val bCanon = b.select(b.columns.sorted.map(col): _*)
    assert(aCanon.exceptAll(bCanon).count() == 0
      && bCanon.exceptAll(aCanon).count() == 0)
    long.unpersist()
  }

  test("predictions are within the label range (0,1]") {
    val models = Ranker.train(fm, sites)
    val long = Ranker.scoreLong(fm, sites, models)
    assert(long.filter(col("score") < 0 || col("score") > 1).count() == 0)
    assert(long.count() > 0, "no missing cells scored — proxy id grain wrong")
  }

  test("model save/load round-trip predicts identically") {
    val target = sites.head
    val models = Ranker.train(fm, Seq(target) ++ sites.filterNot(_ == target))
    val sm = models.find(_.site == target).get
    val dir = java.nio.file.Files.createTempDirectory("graft-model").toString
    sm.model.write.overwrite().save(s"$dir/$target")
    val loaded = org.apache.spark.ml.regression.RandomForestRegressionModel
      .load(s"$dir/$target")
    val wd = Ranker.workData(fm, sites, target, exists = false)
    val orig = sm.model.transform(wd).select("id", target)
    val rt = loaded.transform(wd).select("id", target)
    assert(orig.exceptAll(rt).count() == 0)
  }

  test("ALS recommender: k recs per customer, seeded-reproducible") {
    val recs = Recommender.recommend(tables.lineitem, tables.orders, k = 5)
    val perUser = recs.groupBy("o_custkey").count()
    assert(perUser.filter(col("count") =!= 5).count() == 0,
      "every factorized customer gets exactly k recommendations")
    assert(recs.count() > 0)
    // same seed + same input => identical recommendation sets
    val again = Recommender.recommend(tables.lineitem, tables.orders, k = 5)
    assert(recs.select("o_custkey", "l_partkey")
      .exceptAll(again.select("o_custkey", "l_partkey")).count() == 0)
  }

  test("ALS recovers planted low-rank structure: holdout RMSE beats " +
    "the global-mean predictor") {
    import spark.implicits._
    // rank-2 planted structure: 40 users x 30 items in 2x2 taste
    // blocks plus a deterministic per-cell wobble; 70% of cells kept.
    // A mean predictor can't see the blocks; a factorizer must.
    val cells = for {
      u <- 0 until 40; i <- 0 until 30
      if (u * 31 + i * 17) % 10 < 7
      base = if ((u < 20) == (i < 15)) 40.0f else 10.0f
    } yield (u, i, base + ((u * 7 + i * 13) % 5).toFloat)
    val planted = cells.toDF("user", "item", "rating")
    val (alsRmse, baseline) = Recommender.rmseVsMean(planted)
    assert(alsRmse.isFinite && baseline.isFinite)
    assert(alsRmse < 0.5 * baseline,
      s"ALS rmse $alsRmse did not recover structure (mean $baseline)")
  }
}
