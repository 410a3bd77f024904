package graft

import org.apache.spark.sql.functions._

/** Planted-class vacuousness sweep (VERDICT r12 item 6 — the
  * q202/q177/q234 lesson generalized): a dozen gates depend on
  * deterministically PLANTED modular classes; a fixture regeneration
  * that shrinks a table below a class's modulus (or shifts a key
  * domain) would silently VACATE the gate — it stays hash-green while
  * testing nothing. This sweep asserts every planted class is
  * non-empty at every bundled scale factor, and at /tmp/sf1 when the
  * regenerated fixture is present (it is rebuilt per-round via
  * tools/make_sf1.py; /tmp is wiped between rounds, so sf1 coverage
  * is best-effort here and mandatory in the round checklist).
  *
  * The registry below names the GATE each class feeds, so a failure
  * reads as "regenerating the fixture vacated q224's exact_dup
  * class", not as an anonymous count. */
class PlantedClassSpec extends SparkSpec {

  /** (gate(s), table, predicate) — predicate in Spark SQL over the
    * raw fixture table. */
  private val classes: Seq[(String, String, String)] = Seq(
    ("q150/q177 PII email planting", "documents", "doc_id % 3 = 0"),
    ("q150/q177 PII phone planting", "documents", "doc_id % 5 = 0"),
    ("q150/q177 PII ip + q227 KN held-out slice", "documents",
      "doc_id % 7 = 0"),
    ("q202/q224 exact-dup planting", "documents", "doc_id % 17 = 0"),
    ("q214 corrupt-JSONL planting", "documents", "doc_id % 23 = 0"),
    ("q203 repetitive-doc planting", "documents", "doc_id % 29 = 0"),
    ("near-dup loop planting (q42 family)", "documents",
      "doc_id % 31 = 0"),
    ("q225 mojibake U+FFFD class", "documents", "doc_id % 37 = 0"),
    ("q225 mojibake latin-1 class", "documents", "doc_id % 41 = 0"),
    ("q225 control-char class", "documents", "doc_id % 43 = 0"),
    ("q95/q112/q224 benchmark slice", "documents", "doc_id % 97 = 0"),
    ("multimodal PNG magic class", "documents", "doc_id % 5 = 0"),
    ("multimodal JPEG magic class", "documents", "doc_id % 5 = 1"),
    ("multimodal WAV magic class", "documents", "doc_id % 5 = 2"),
    ("boilerplate header class (q85 family)", "documents",
      "doc_id % 3 = 0"),
    ("boilerplate footer class (q85 family)", "documents",
      "doc_id % 4 = 0"),
    ("q143 snapshot delete class", "customer", "c_custkey % 23 = 0"),
    ("q143 snapshot bump class", "customer", "c_custkey % 7 = 0"),
    ("q143 snapshot reinsert class", "customer", "c_custkey % 31 = 0"),
    ("q233/q234 geo twin anchors", "customer", "c_custkey % 50 = 1"),
    // q177/q183 token-count gate: BOTH sides must be populated — a
    // fixture whose every doc passes (or fails) minTokens=40 makes
    // the gate a no-op that still hashes green
    ("q177/q183 quality-gate PASS side (>=40 tokens)", "documents",
      "size(split(text, ' ')) >= 40"),
    ("q177/q183 quality-gate FAIL side (<40 tokens)", "documents",
      "size(split(text, ' ')) < 40"))

  private def sfDirs: Seq[String] = {
    val bundled = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val sf1 = new java.io.File("/tmp/sf1")
    bundled ++ (if (sf1.isDirectory) Seq("/tmp/sf1") else Seq.empty)
  }

  test("every planted modular class is non-empty at every available " +
    "scale factor") {
    for (dir <- sfDirs) {
      val t = new Tables(spark, dir)
      val byTable = classes.groupBy(_._2)
      for ((table, cls) <- byTable.toSeq.sortBy(_._1)) {
        val df = table match {
          case "documents" => t.documents
          case "customer" => t.customer
        }
        // ONE scan per table: count every class as a conditional sum
        val counts = df.select(cls.map { case (_, _, pred) =>
          sum(when(expr(pred), 1L).otherwise(0L)) }: _*).head()
        cls.zipWithIndex.foreach { case ((gate, _, pred), i) =>
          val n = counts.getLong(i)
          info(f"$dir%-25s $gate%-50s $n%7d rows")
          assert(n > 0, s"VACATED planted class at $dir: $gate ($pred)")
        }
      }
    }
  }

  test("geo twin PAIRS are complete (anchor k%50==1 AND partner k+1 " +
    "both present) at every available scale factor") {
    // custPoints gives a twin the coordinates of k+1 shifted (+1,0) —
    // the distance-1 pair only EXISTS if k+1 is also a live customer
    // key, so pair completeness (not just anchor presence) is the
    // non-vacuity condition for q233/q234
    for (dir <- sfDirs) {
      val t = new Tables(spark, dir)
      val keys = t.customer.select(col("c_custkey").cast("long").as("k"))
      val pairs = keys.filter(col("k") % 50 === 1)
        .join(keys.select((col("k") - 1).as("k")), Seq("k"), "left_semi")
        .count()
      info(f"$dir%-25s complete geo twin pairs: $pairs%d")
      assert(pairs > 0, s"no complete geo twin pair at $dir")
    }
  }
}
