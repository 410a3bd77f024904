package graft.ml

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document quality scoring — the CCNet/fastText-shaped
  * linear classifier every public LLM-data pipeline runs after the
  * statistical filters (Gopher repetition, boilerplate, LM score):
  * train "does this look like the target domain?" on hashed word
  * n-grams from a target-domain slice vs random corpus text, then
  * score every document with P(target). (Wenzek et al., "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data",
  * LREC 2020 — the public recipe; no proprietary system involved.)
  *
  * Scale posture at 100 TB:
  *  - Featurization is the HASHING TRICK — no vocabulary dictionary,
  *    no fit pass, no shuffle: tokens+bigrams hash straight into a
  *    fixed 2^18-dim sparse vector in a narrow map riding the scan.
  *  - Training runs on a (seeded) SAMPLE — the standard CCNet practice;
  *    a linear model saturates long before corpus scale. Each LBFGS
  *    iteration is one treeAggregate (map-side gradient partials).
  *  - Scoring broadcasts one dense coefficient vector (2^18 doubles ≈
  *    2 MB) and is embarrassingly parallel — a narrow transform.
  *
  * Determinism: HashingTF is a pure hash; LogisticRegression's LBFGS
  * starts from zero coefficients — same input → same model → same
  * scores. The declared query (`ml_quality_scores`) therefore needs no
  * RNG seed: its train slice and planted domain labels derive from
  * doc_id residues. Scores are floats → rows-only gate; the REAL gate
  * is QualitySpec's planted-structure recovery on held-out docs (the
  * ml_als_recs discipline, `Recommender.rmseVsMean`). */
object QualityModel {

  /** Hashed unigram+bigram indicator features (binary=true: CCNet's
    * fastText features are presence-weighted; binary also makes the
    * featurizer length-robust). Appends a `features` vector column. */
  def hashedNgrams(
      df: DataFrame, textCol: String = "text",
      dims: Int = 1 << 18): DataFrame = {
    val tk = split(lower(col(textCol)), "\\s+")
    val bi = zip_with(
      slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
      slice(tk, lit(2), greatest(size(tk) - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    val terms = df.withColumn("__terms", concat(tk, bi))
    new HashingTF().setInputCol("__terms").setOutputCol("features")
      .setNumFeatures(dims).setBinary(true)
      .transform(terms).drop("__terms")
  }

  /** Fit the linear quality model on a frame carrying `features` +
    * binary `label` (1.0 = target domain). L2-regularized — hashed
    * dims ≫ examples on a sampled train set. */
  def train(
      labeled: DataFrame, maxIter: Int = 30,
      regParam: Double = 1e-4): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(labeled)

  /** Score a corpus: P(target-domain) per document as `quality`.
    * Featurizer dimensionality comes FROM the model
    * (`model.numFeatures`), so a loaded model can never be scored
    * against a mismatched hash space — the mismatch is
    * unrepresentable rather than a silent wrong answer. */
  def score(
      model: LogisticRegressionModel, corpus: DataFrame,
      textCol: String = "text"): DataFrame =
    model.transform(hashedNgrams(corpus, textCol, model.numFeatures))
      .withColumn("quality",
        vector_to_array(col("probability")).getItem(1))
      .drop("features", "rawPrediction", "probability", "prediction")

  /** The declared query (`ml_quality_scores`): the fixture corpus has
    * no quality gradient, so the target domain is PLANTED
    * deterministically from doc_id — every doc_id%5==0 doc gets a
    * domain vocabulary suffix (shared markers + a per-doc topic token,
    * the q150 construction). The model trains on the doc_id%2==0
    * half — labels included — and scores ALL docs, so half the corpus
    * is scored strictly out-of-sample; QualitySpec gates the held-out
    * separation. Output: (doc_id, label, quality), rows-only. */
  def ccnetScores(
      documents: DataFrame, dims: Int = 1 << 18): DataFrame = {
    val id = col("doc_id")
    val domain = concat_ws(" ",
      lit("wiki citation reference encyclopedia"),
      concat(lit("topic"), (id % 17).cast("string")))
    val enriched = documents.withColumn("text",
      when(id % 5 === 0, concat_ws(" ", col("text"), domain))
        .otherwise(col("text")))
    val labeled = hashedNgrams(enriched, dims = dims)
      .withColumn("label", (id % 5 === 0).cast("double"))
    val model = train(labeled.filter(id % 2 === 0))
    score(model, enriched)
      .withColumn("label", (id % 5 === 0).cast("double"))
      .select(col("doc_id"), col("label"), col("quality"))
      .orderBy("doc_id")
  }

  /** Persist / reload the trained model (the S8 ML-sink discipline,
    * `Ranker.loadModels` precedent): the production workflow trains on
    * a sample once and scores every later corpus increment with the
    * SAME model — retraining per increment would shift the score
    * distribution under downstream thresholds. Spark ML's native
    * writer: a directory of parquet + metadata, valid on any Hadoop
    * filesystem. */
  def saveModel(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadModel(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)
}
