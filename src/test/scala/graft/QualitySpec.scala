package graft

import graft.ml.QualityModel
import org.apache.spark.sql.functions._

/** Gate for the CCNet-style hashed-ngram quality classifier
  * (`ml_quality_scores`, rows-only declared): scores are
  * float/model-dependent, so correctness is proved by PLANTED-STRUCTURE
  * RECOVERY on held-out documents — the `Recommender.rmseVsMean`
  * discipline. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("crafted corpora: the model separates two vocabularies it was " +
    "trained on, scoring held-out docs of each side correctly") {
    val target = (0 until 30).map(i =>
      (i.toLong, s"reference article citation section $i history notes"))
    val noise = (30 until 60).map(i =>
      (i.toLong, s"buy cheap deal now offer $i click win prize"))
    val docs = (target ++ noise).toDF("doc_id", "text")
    val labeled = QualityModel.hashedNgrams(docs, dims = 1 << 12)
      .withColumn("label", ($"doc_id" < 30).cast("double"))
    // train on the even ids only; odd ids are out-of-sample
    val model = QualityModel.train(labeled.filter($"doc_id" % 2 === 0))
    val heldOut = QualityModel
      .score(model, docs.filter($"doc_id" % 2 === 1))
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
    heldOut.foreach { case (id, q) =>
      assert(q >= 0.0 && q <= 1.0, s"$id: $q")
      if (id < 30) assert(q > 0.5, s"held-out target doc $id scored $q")
      else assert(q < 0.5, s"held-out noise doc $id scored $q")
    }
    // score() derives the hash space from the model, so the non-default
    // 2^12 training dims carry through without being re-specified
    assert(model.numFeatures == (1 << 12))
    // production workflow: persist the model, reload, score identically
    val dir = java.nio.file.Files
      .createTempDirectory("quality_model").toString
    QualityModel.saveModel(model, dir)
    val reloaded = QualityModel.loadModel(dir)
    val again = QualityModel
      .score(reloaded, docs.filter($"doc_id" % 2 === 1))
      .select($"doc_id", $"quality").as[(Long, Double)].collect()
    assert(again.toSeq.sorted == heldOut.toSeq.sorted)
  }

  test("ml_quality_scores recovers the planted domain slice on the " +
    "held-out half of the fixture corpus") {
    val scores = QualityModel.ccnetScores(tables.documents)
    val n = tables.documents.count()
    assert(scores.count() == n) // one score per doc
    // the doc_id%2==1 half never contributed a labeled example
    val held = scores.filter($"doc_id" % 2 === 1)
      .select($"label", $"quality").as[(Double, Double)].collect()
    val pos = held.collect { case (1.0, q) => q }
    val neg = held.collect { case (0.0, q) => q }
    assert(pos.nonEmpty && neg.nonEmpty)
    val acc = (pos.count(_ > 0.5) + neg.count(_ < 0.5)).toDouble /
      (pos.length + neg.length)
    assert(acc > 0.9, f"held-out accuracy $acc%.3f")
    assert(pos.sum / pos.length - neg.sum / neg.length > 0.6,
      f"separation ${pos.sum / pos.length - neg.sum / neg.length}%.3f")
  }

  test("scores are deterministic: no RNG anywhere in featurize/train/" +
    "score, so two runs agree bitwise") {
    val a = QualityModel.ccnetScores(tables.documents)
      .select("doc_id", "quality").as[(Long, Double)].collect().toSeq
    val b = QualityModel.ccnetScores(tables.documents)
      .select("doc_id", "quality").as[(Long, Double)].collect().toSeq
    assert(a == b)
  }
}
