package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round-13 verdict's one real finding was in the bench
  * INSTRUMENT: the sweep-outlier gate regex-scraped BASELINE.md and
  * mis-armed 70/238 queries (second-column cells invisible,
  * last-occurrence fallthrough to sf1 scale-table rows — q192 armed
  * at 33.9 s vs its true 5.035). This suite is that bug's regression
  * fence, per the verdict's stated "done" criterion: the gate
  * baseline [[BenchGate]] actually loads must equal the round-13
  * re-baseline table row-for-row for all 238 queries, and a planted
  * >1.5× outlier must be flagged for focused re-measure. */
class BenchGateSpec extends AnyFunSuite {

  private def repoFile(name: String) = {
    // tests run with cwd = repo root under sbt
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing from repo root")
    p
  }

  /** The round-13 re-baseline table, parsed CORRECTLY: scoped to its
    * own section (never the historical or scale tables), both query
    * columns of each row. This is the reference parse the gate file
    * is checked against — written independently of the extraction
    * that produced baseline_rows.json. */
  private lazy val rebaselineTable: Map[String, Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(repoFile("BASELINE.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val start = text.indexOf("## Round-13 A/B drift adjudication")
    val end = text.indexOf("## Round-13 per-stage budgets")
    assert(start >= 0 && end > start, "re-baseline section not found")
    val sec = text.substring(start, end)
    val row = """^q\d+\w*$""".r
    sec.linesIterator.flatMap { line =>
      val cells = line.trim.stripPrefix("|").stripSuffix("|")
        .split('|').map(_.trim)
      if (cells.length == 4 && row.matches(cells(0))) {
        val first = Seq(cells(0) -> cells(1).toDouble)
        if (cells(2).nonEmpty) first :+ (cells(2) -> cells(3).toDouble)
        else first
      } else Nil
    }.toMap
  }

  /** Rows that later optimization sections SUPERSEDE (their focused
    * post-optimization rows, tighter than the re-baseline's — under
    * the old whole-file last-occurrence-wins convention such later
    * rows won; the gate file encodes the same outcome explicitly).
    * Every addition here must cite its BASELINE.md section. */
  private val documentedSupersedes = Map(
    "q177_corpus_increment" -> 12.615, // Round-13 optimization table
    "q183_training_shards" -> 16.900,  // Round-13 optimization table
    // Round-14 "shingle scans out of interpreted lambdas" section:
    // the 15 n-gram-family queries re-cut from the only full sweep
    // of the optimized tree
    "q19_ngram_jaccard" -> 2.752,
    "q43_containment" -> 2.981,
    "q95_decontamination" -> 0.751,
    "q125_novelty" -> 1.082,
    "q129_split_contamination" -> 1.000,
    "q135_allpairs_jaccard" -> 2.244,
    "q181_allpairs_realvocab" -> 2.617,
    "q192_corpus_containment" -> 1.451,
    "q193_memorization_risk" -> 1.072,
    "q200_ngram_ledger_risk" -> 2.441,
    "q205_contamination_spans" -> 0.653,
    "q207_canary_spans" -> 2.462,
    "q210_gram_novelty" -> 1.034,
    "q211_gram_loops" -> 3.302,
    "q224_curation_manifest" -> 8.356)

  test("baseline_rows.json equals the round-13 re-baseline table " +
    "row-for-row (all 238 queries, both markdown columns, modulo " +
    "the two documented supersedes)") {
    val gate = BenchGate.loadQueryBaseline(
      repoFile("baseline_rows.json").toString)
    assert(rebaselineTable.size == 238,
      s"reference parse found ${rebaselineTable.size} rows, want 238")
    assert(gate.keySet == rebaselineTable.keySet,
      s"key sets differ: only-in-json=${gate.keySet -- rebaselineTable.keySet}, " +
        s"only-in-table=${rebaselineTable.keySet -- gate.keySet}")
    for ((k, v) <- rebaselineTable) {
      val expected = documentedSupersedes.getOrElse(k, v)
      assert(math.abs(gate(k) - expected) < 1e-9,
        s"$k: gate=${gate(k)} expected=$expected (table=$v)")
    }
  }

  test("the four queries the old parser disarmed are armed at their " +
    "true current rows") {
    val gate = BenchGate.loadQueryBaseline(
      repoFile("baseline_rows.json").toString)
    // the old regex resolved these to sf1 scale-table rows 5-7x too
    // high (q192 at 33.9 instead of its then-true 5.035), turning the
    // gate off; q192/q200 have since been tightened further by the
    // round-14 optimization supersedes
    assert(gate("q192_corpus_containment") == 1.451)
    assert(gate("q216_mojibake_audit") == 0.341)
    assert(gate("q200_ngram_ledger_risk") == 2.441)
    assert(gate("q212_char_entropy") == 0.988)
  }

  test("a planted >1.5x sweep outlier is flagged for focused " +
    "re-measure; in-band and baseline-less queries are not") {
    val baseline = Map("qa" -> 1.0, "qb" -> 2.0, "qc" -> 0.5)
    val results = Seq(
      "qa" -> 1.51, // 1.51x -> flagged
      "qb" -> 2.9,  // 1.45x -> in band
      "qc" -> 0.75, // exactly 1.5x -> NOT flagged (strict >)
      "qd" -> 99.0) // no baseline row -> never flagged
    assert(BenchGate.flagged(results, baseline) == Seq("qa"))
    // the gate-off posture: empty baseline flags nothing
    assert(BenchGate.flagged(results, Map.empty).isEmpty)
  }

  test("loadQueryBaseline/loadStageBudgets round-trip a written " +
    "gate file and return empty when the file is absent") {
    val tmp = java.nio.file.Files.createTempFile("gate", ".json")
    java.nio.file.Files.write(tmp,
      """{"queries":{"q01_x":0.378,"q192_y":5.035},
         |"stage_budgets":{"q177":{"inc/exact":4.6,"inc/near":3.2}}}"""
        .stripMargin.getBytes("UTF-8"))
    assert(BenchGate.loadQueryBaseline(tmp.toString) ==
      Map("q01_x" -> 0.378, "q192_y" -> 5.035))
    assert(BenchGate.loadStageBudgets(tmp.toString) ==
      Map("q177" -> Map("inc/exact" -> 4.6, "inc/near" -> 3.2)))
    assert(BenchGate.loadQueryBaseline("/nonexistent/gate.json").isEmpty)
    assert(BenchGate.loadStageBudgets("/nonexistent/gate.json").isEmpty)
  }
}
