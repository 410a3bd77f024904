package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender — the matrix-factorization
  * generalization of the reference's per-site regression ranking
  * (reference scope: one RF model per target site,
  * `ModelBuilder.scala:13-39`; here one factor model over the whole
  * customer×part interaction matrix).
  *
  * Scale posture: MLlib ALS is the canonical DISTRIBUTED factorizer —
  * both factor matrices live as block-partitioned datasets, each
  * least-squares sweep is a join-shaped Spark job (nothing
  * driver-side), and `recommendForAllUsers` is a blocked factor
  * cross-join with a per-block bounded top-k heap. The rating build is
  * one join + one hash aggregate off the fact table.
  *
  * Determinism: seeded (init factors derive from the seed), so the
  * same input and partitioning reproduce the same model; scores stay
  * float/BLAS-dependent, so the declared query is rows-only-gated and
  * the REAL gate is MlSpec: holdout RMSE must beat the global-mean
  * predictor, k recommendations per customer, purchased-dominated
  * relevance. */
object Recommender {

  /** MLlib ALS keys are Int; a silent long→int cast would alias
    * customers 2³² apart. Guard loudly, like `Writers.zValueChecked`. */
  private def intKey(c: org.apache.spark.sql.Column) =
    when(c.between(0L, Int.MaxValue.toLong), c.cast("int"))
      .otherwise(raise_error(concat(
        lit("ALS key out of [0, 2^31): "),
        coalesce(c.cast("string"), lit("null")))))

  /** Implicit ratings: total purchased quantity per (customer, part),
    * from lineitem ⋈ orders. */
  def ratings(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy(intKey(col("o_custkey")).as("user"),
        intKey(col("l_partkey")).as("item"))
      .agg(sum("l_quantity").cast("float").as("rating"))

  private def als(rank: Int, iters: Int, seed: Long): ALS =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(iters).setSeed(seed)
      .setRegParam(0.1).setColdStartStrategy("drop")

  /** Top-`k` part recommendations per customer:
    * (o_custkey, l_partkey, score). Rows-only declared query
    * (`ml_als_recs`) — float scores are model-dependent. */
  def recommend(
      lineitem: DataFrame, orders: DataFrame, k: Int = 5,
      rank: Int = 8, iters: Int = 5, seed: Long = 42L): DataFrame = {
    val model = als(rank, iters, seed).fit(ratings(lineitem, orders))
    model.recommendForAllUsers(k)
      .select(col("user").cast("long").as("o_custkey"),
        explode(col("recommendations")).as("rec"))
      .select(col("o_custkey"),
        col("rec.item").cast("long").as("l_partkey"),
        col("rec.rating").cast("double").as("score"))
      .orderBy("o_custkey", "l_partkey")
  }

  /** Seeded-holdout RMSE of the ALS model vs the global-mean
    * predictor on the same split of a (user, item, rating) frame —
    * the spec gate's quality signal (same shape as [[Ranker]]'s
    * RMSE-beats-naive contract). NOTE: only meaningful on ratings with
    * LATENT STRUCTURE — on structureless uniform ratings (e.g. raw
    * TPC-H quantities) no factorization can beat the mean, so the spec
    * gates recovery of PLANTED low-rank structure and uses the TPC-H
    * frame only for the mechanical contracts (k per user, seeded
    * reproducibility). */
  def rmseVsMean(
      ratingsDf: DataFrame, rank: Int = 8, iters: Int = 5,
      seed: Long = 42L): (Double, Double) = {
    val Array(train, test) =
      ratingsDf.randomSplit(Array(0.75, 0.25), seed)
    val model = als(rank, iters, seed).fit(train)
    val evalr = new RegressionEvaluator().setMetricName("rmse")
      .setLabelCol("rating").setPredictionCol("prediction")
    // coldStartStrategy=drop removes unseen-user/item test rows from
    // the ALS predictions; the baseline MUST be scored on the SAME
    // surviving rows or the comparison is apples-to-oranges
    val pred = model.transform(test).localCheckpoint(true)
    val alsRmse = evalr.evaluate(pred)
    val mean = train.agg(avg("rating")).head().getDouble(0)
    val baseline = evalr.evaluate(
      pred.withColumn("prediction", lit(mean)))
    (alsRmse, baseline)
  }
}
