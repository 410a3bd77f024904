package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(
        Similarity.asDouble(col("a")), Similarity.asDouble(col("b")))
        .as("cos"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("cosineTopK returns k neighbors per query, self excluded") {
    val r = Similarity.cosineTopK(tables.embeddings, 10, 5)
    val byQ = r.groupBy("qid").agg(count(lit(1)).as("n"),
      max(when(col("qid") === col("cid"), 1).otherwise(0)).as("self"))
    assert(byQ.filter(col("n") =!= 5 || col("self") === 1).count() == 0)
  }

  test("LSH topk recall vs brute force") {
    val exact = Similarity.cosineTopK(tables.embeddings, 10, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshCosineTopK(tables.embeddings, 64, 10, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 16-bit/4-band LSH on random-ish embeddings: expect moderate recall
    assert(recall >= 0.3, s"LSH recall $recall (approx=${approx.size})")
    info(s"LSH recall@5 = $recall")
  }

  test("IVF topk recall vs brute force") {
    val exact = Similarity.cosineTopK(tables.embeddings, 10, 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfCosineTopK(tables.embeddings, 64, 10, 5,
      nlist = 8, nprobe = 4)
    val approx = ivf.select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"IVF recall@5 = $recall")
    // probing half the cells on near-random vectors: expect decent recall
    assert(recall >= 0.4, s"IVF recall $recall (got ${approx.size} pairs)")
  }

  test("PQ/ADC topk recall vs brute force, scores are exact cosines") {
    import spark.implicits._
    val exactDf = Similarity.cosineTopK(tables.embeddings, 10, 5)
    val exact = exactDf.select("qid", "cid").as[(Long, Long)].collect().toSet
    val pqDf = Similarity.pqCosineTopK(tables.embeddings, 64, 10, 5)
    val approx = pqDf.select("qid", "cid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"PQ recall@5 = $recall")
    assert(recall >= 0.4, s"PQ recall $recall (got ${approx.size} pairs)")
    // re-ranked scores must be TRUE cosines: every (qid,cid) the two
    // methods share must carry the identical rounded cosine
    val exactScores = exactDf.select("qid", "cid", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    val mismatches = pqDf.select("qid", "cid", "cos")
      .as[(Long, Long, Double)].collect()
      .count { case (q, c, s) =>
        exactScores.get((q, c)).exists(_ != s) }
    assert(mismatches == 0)
    // deterministic: no RNG anywhere in training/encoding
    val again = Similarity.pqCosineTopK(tables.embeddings, 64, 10, 5)
      .collect().map(_.toString).sorted.toSeq
    assert(again == pqDf.collect().map(_.toString).sorted.toSeq)
  }

  test("embeddingNearDups emits only high-cosine collision pairs") {
    val r = Similarity.embeddingNearDups(tables.embeddings, 64, 0.9)
    assert(r.filter(col("cos") < 0.9).count() == 0)
  }

  test("semanticDedup equals the transitive closure of the pair list") {
    val pairs = Similarity.embeddingNearDupsPortable(tables.embeddings)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find over the collected pair list (small at
    // this SF) — the drop list must keep exactly one min id per group
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = members.map(m => m -> find(m))
      .filter { case (m, r) => m != r }.toMap
    val got = Similarity.semanticDedup(tables.embeddings)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
