package graft.ml

import java.util.concurrent.Executors
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Train/score stage: per-site RandomForest regression predicting a
  * site's popularity rank from every *other* site's features —
  * the reference's ModelBuilder/ScorePredictor rebuilt on an MLlib
  * `VectorAssembler → RandomForestRegressor` pipeline.
  *
  * What changes vs the reference (SURVEY §3.3, §4.4):
  *  - name-based column selection via VectorAssembler instead of
  *    positional field-index slicing (Utils.scala:41-42 depended
  *    silently on schema layout);
  *  - seeds pinned everywhere (`randomSplit`, RF) — the reference was
  *    unseeded (ModelBuilder.scala:23);
  *  - the `exists` leakage semantic is preserved exactly: the feature
  *    vector includes other sites' exists flags but excludes the whole
  *    target triple (Utils.scala:39-43);
  *  - per-site failure isolation with an empty typed frame fallback
  *    (ScorePredictor.scala:37-44) is kept;
  *  - the N-way outer-join score-matrix reduce (ScorePredictor.scala:47)
  *    is replaced by union-then-pivot — one shuffle instead of N−1,
  *    and the plan depth no longer grows with the site count. The
  *    join-chain form is kept for parity testing.
  */
object Ranker {

  val Seed = 42L

  /** Feature columns for a target site: every other site's full triple
    * (reference "include everything except the target language's
    * features", Utils.scala:39-43). */
  def featureCols(sites: Seq[String], target: String): Array[String] =
    sites.sorted.filterNot(_ == target)
      .flatMap(s => Seq(s"pageviews_$s", s"rank_$s", s"exists_$s")).toArray

  /** Work data for one target: rows where the target exists (training,
    * exists=1.0) or is missing (scoring, exists=0.0), with `label` =
    * the target's rank and `features` assembled by name. */
  def workData(
      features: DataFrame, sites: Seq[String], target: String,
      exists: Boolean): DataFrame = {
    val flag = if (exists) 1.0 else 0.0
    val assembler = new VectorAssembler()
      .setInputCols(featureCols(sites, target))
      .setOutputCol("features")
    assembler
      .transform(features.filter(col(s"exists_$target") === flag))
      .withColumn("label", col(s"rank_$target"))
      .select("id", "label", "features")
  }

  private def regressor(target: String): RandomForestRegressor =
    new RandomForestRegressor() // MLlib defaults: 20 trees, depth 5 —
      .setLabelCol("label")     // matches the reference (Utils.scala:22-24)
      .setFeaturesCol("features")
      .setPredictionCol(target)
      .setSeed(Seed)

  final case class SiteModel(
      site: String, model: RandomForestRegressionModel, rmse: Double)

  /** Train one model per site concurrently (bounded pool — the
    * reference's 8-way ForkJoin `.par`, JobRunner.scala:15,51-54; Spark's
    * scheduler multiplexes the concurrent jobs), with per-site failure
    * isolation. Returns only the sites that trained successfully. */
  def train(
      features: DataFrame, sites: Seq[String],
      parallelism: Int = 0,
      targets: Seq[String] = Seq()): Seq[SiteModel] = {
    // targets restricts which sites get a model (reference
    // --target-wikis); `sites` stays the full feature-column universe
    val toTrain = if (targets.nonEmpty) sites.filter(targets.contains)
      else sites
    // default: one slot per site up to the reference's 8-way fan-out
    // (JobRunner.scala:15); FAIR scheduling (Sessions) shares executors
    val slots =
      if (parallelism > 0) parallelism else math.min(toTrain.size, 8)
    val pool = Executors.newFixedThreadPool(math.max(slots, 1))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = toTrain.map { site =>
        Future {
          try {
            val work = workData(features, sites, site, exists = true)
            val Array(trainDf, testDf) =
              work.randomSplit(Array(0.7, 0.3), Seed)
            val model = regressor(site).fit(trainDf)
            val predictions = model.transform(
              if (testDf.isEmpty) trainDf else testDf)
            // evaluator is per-task: Params are mutable, sharing one
            // across concurrent site fits races on predictionCol
            val rmse = new RegressionEvaluator()
              .setLabelCol("label").setMetricName("rmse")
              .setPredictionCol(site).evaluate(predictions)
            Some(SiteModel(site, model, rmse))
          } catch {
            case e: Exception =>
              System.err.println(s"[ranker] train $site failed: ${e.getMessage}")
              None
          }
        }
      }
      Await.result(Future.sequence(futures), Duration.Inf).flatten
    } finally pool.shutdown()
  }

  /** Load persisted per-site models for score-only runs (reference
    * ScorePredictor.scala:26-34: `RandomForestRegressionModel.load(new
    * File(modelsInputDir, target))`), with the same per-site failure
    * isolation — a missing or corrupt model dir skips that site instead
    * of failing the run. The prediction column is re-pinned to the site
    * name exactly as the reference re-sets it after load. RMSE is not
    * persisted alongside models; loaded entries carry NaN. */
  def loadModels(modelsDir: String, targets: Seq[String]): Seq[SiteModel] =
    targets.flatMap { site =>
      try {
        val m = RandomForestRegressionModel.load(s"$modelsDir/$site")
        Some(SiteModel(site, m.setPredictionCol(site), Double.NaN))
      } catch {
        case e: Exception =>
          System.err.println(s"[ranker] load $site failed: ${e.getMessage}")
          None
      }
    }

  /** Score the missing (exists=0) rows of every modeled site; long form
    * `(id, site, score)`. Sites with no missing rows contribute no rows;
    * a failed site contributes the reference's empty-frame fallback. */
  def scoreLong(
      features: DataFrame, sites: Seq[String],
      models: Seq[SiteModel]): DataFrame = {
    val spark = features.sparkSession
    val emptyFallback = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", StringType), StructField("site", StringType),
        StructField("score", DoubleType))))
    models.map { sm =>
      try {
        val missing = workData(features, sites, sm.site, exists = false)
        sm.model.transform(missing)
          .select(col("id"), lit(sm.site).as("site"),
            col(sm.site).as("score"))
      } catch {
        case e: Exception =>
          System.err.println(s"[ranker] score ${sm.site} failed: ${e.getMessage}")
          emptyFallback
      }
    }.reduceOption(_ unionByName _).getOrElse(emptyFallback)
  }

  /** Score matrix `id × sites` via union+pivot — the scale-path rewrite
    * of the reference's outer-join reduce (one shuffle, flat plan). */
  def scoreMatrix(scoreLongDf: DataFrame, sites: Seq[String]): DataFrame =
    scoreLongDf.groupBy("id").pivot("site", sites.sorted)
      .agg(first("score"))

  /** The reference's literal left-deep full-outer-join chain
    * (ScorePredictor.scala:47) — kept for parity testing against
    * [[scoreMatrix]]. */
  def scoreMatrixJoinChain(
      scoreLongDf: DataFrame, sites: Seq[String]): DataFrame = {
    val perSite = sites.sorted.map(s =>
      scoreLongDf.filter(col("site") === s)
        .select(col("id"), col("score").as(s)))
    perSite.filter(!_.isEmpty).toList match {
      case Nil => scoreLongDf.select("id").distinct()
      case head :: tail =>
        tail.foldLeft(head)((l, r) => l.join(r, Seq("id"), "full_outer"))
    }
  }

  /** End-to-end pipeline on the events proxy domain: parse → rank →
    * pivot → train → score-missing → score matrix. */
  def pipeline(spark: SparkSession, events: DataFrame): DataFrame = {
    val (fm, sites) = Features.featureMatrix(events)
    val cached = fm.cache()
    try {
      val models = train(cached, sites)
      scoreMatrix(scoreLong(cached, sites, models), models.map(_.site))
        .orderBy("id")
    } finally { cached.unpersist(); () }
  }

  /** Per-site holdout RMSE (the reference's logged quality signal,
    * ModelBuilder.scala:33-34) as a queryable frame. */
  def rmseReport(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val (fm, sites) = Features.featureMatrix(events)
    val cached = fm.cache()
    try {
      train(cached, sites).map(sm => (sm.site, sm.rmse))
        .toDF("site", "rmse").orderBy("site")
    } finally { cached.unpersist(); () }
  }
}
