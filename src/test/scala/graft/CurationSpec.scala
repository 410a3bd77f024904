package graft

import graft.operators.{Curation, Dedup, Scrub, TextAnalysis}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("curationManifest: every reason class populated and precedence " +
    "exact on a crafted corpus") {
    // sw_ratio design: every "low" doc carries exactly one stopword
    // ('a') among >= 6 tokens (sw <= 1/6), the three dedicated quality
    // docs sit at 1/5 = 0.2, doc 5 at 1.0 — so the per-lang p75 lands
    // at 0.2 (4 of 13 rows are >= 0.2, just over the top quartile) and
    // the low docs stay below the gate instead of a degenerate p75 = 0
    // flagging everything
    val base = "alpha beta a gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu"
    val docs = docsOf(Seq(
      (1L, "dup a nu xi omicron cedilla"), // blocklist
      (17L, "pi rho a sigma tau upsilon"), // planted copy -> exact_dup
      (2L, base + " extraword"), // canonical of the 2/3 component
      (3L, base), // near_dup (loses to the longer 2)
      (97L, "mountain river forest desert ocean a harbor"), // benchmark
      (4L, "mountain river forest desert a plain canyon valley " +
        "glacier tundra steppe prairie mesa"), // shares a 4-gram w/ 97
      (5L, "the a of and the a"), // sw_ratio 1.0 -> quality
      (6L, "a cobalt indigo teal ochre"), // 0.2 -> quality
      (7L, "a falcon heron plover sparrow"), // 0.2 -> quality
      (8L, "a quartz basalt gneiss schist"), // 0.2 -> quality
      (34L, "dup a phi chi psi omega"))) // %17 copy carries 'dup' too
    val m = Curation.curationManifest(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap
    assert(m(1L)._1 == "blocklist")
    assert(m(100000017L)._1 == "exact_dup")
    assert(m(2L)._1 == "keep" && m(2L)._2 == 1L)
    assert(m(3L)._1 == "near_dup")
    assert(m(97L)._1 == "benchmark")
    assert(m(4L)._1 == "contaminated")
    assert(m(5L)._1 == "quality")
    assert(m(6L)._1 == "quality" && m(7L)._1 == "quality" &&
      m(8L)._1 == "quality")
    assert(m(17L)._1 == "keep")
    // precedence: a planted exact copy that ALSO carries a blocklist
    // term reports blocklist, not exact_dup
    assert(m(34L)._1 == "blocklist" && m(100000034L)._1 == "blocklist")
    // kept is exactly the keep reason
    m.values.foreach { case (r, k) =>
      assert(k == (if (r == "keep") 1L else 0L))
    }
  }

  test("curationManifest: fixture manifest equals the composed stage " +
    "replay under the declared precedence") {
    val documents = tables.documents
    val planted = documents.unionByName(
      documents.filter(pmod(col("doc_id"), lit(17)) === 0)
        .withColumn("doc_id", col("doc_id") + 100000000L))
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val bl = ids(Scrub.blocklistTag(planted, Seq("dup"))
      .filter(col("blocked")))
    val keep = planted.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("k"))
    val xd = ids(planted.select(col("doc_id"), md5(col("text")).as("h"))
      .join(keep, "h").filter(col("doc_id") =!= col("k")))
    val canon = Dedup.canonicalDocs(planted)
      .select("component", "canonical_doc")
    val nd = ids(Dedup.nearDupComponents(planted).join(canon, "component")
      .filter(col("doc_id") =!= col("canonical_doc")))
    val ct = ids(Dedup.decontaminationPairs(planted)
      .filter(col("shared_ngrams") >= 1L).select("doc_id").distinct())
    val qf = ids(TextAnalysis.qualityGate(planted))
    val rows = Curation.curationManifest(documents).collect()
    assert(rows.map(_.getLong(0)).toSet == ids(planted))
    rows.foreach { r =>
      val id = r.getLong(0)
      val want =
        if (bl(id)) "blocklist"
        else if (xd(id)) "exact_dup"
        else if (nd(id)) "near_dup"
        else if (id % 97 == 0) "benchmark"
        else if (ct(id)) "contaminated"
        else if (qf(id)) "quality"
        else "keep"
      assert(r.getString(3) == want, s"doc $id")
    }
    // the planted exact_dup class is non-vacuous at every sf
    assert(rows.exists(_.getString(3) == "exact_dup"))
    assert(rows.exists(_.getString(3) == "keep"))
  }
}
