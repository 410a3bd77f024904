package graft

/** Machine-readable gate baselines (round-13 verdict item 1): the
  * 1.5x sweep-outlier re-measure gate in [[Bench]] and the per-stage
  * budget tripwire in [[StageBench]] `--check` read
  * `baseline_rows.json` — never the BASELINE.md markdown. The old
  * gate parser regex-scraped the markdown tables; its cell regex
  * consumed the pipe between the two query columns of the round-13
  * re-baseline table (making every second-column row invisible) and
  * "last occurrence wins" then fell through to OLDER tables —
  * including sf1/sf10 SCALE-table rows — so 70/238 queries were
  * gated against the wrong number and four (q192/q200/q212/q216)
  * against 5–7x-too-high sf1 values, i.e. effectively ungated. The
  * q192 = 19.64 s sweep artifact shipped unadjudicated in
  * BENCH_r13.json precisely because of that. The JSON is emitted by
  * tools/baseline_table.py alongside the human-readable table, so
  * the table and the gate cannot drift apart again.
  */
object BenchGate {
  import com.fasterxml.jackson.databind.ObjectMapper

  val DefaultPath = "baseline_rows.json"

  private def root(path: String) = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      Some(new ObjectMapper().readTree(p.toFile))
    else None
  }

  /** Per-query gate baselines (seconds at sf0.1) from the `queries`
    * map. Empty when the file is absent → gate off. NOTE (round-14
    * advice, corrected): `baseline_rows.json` is TRACKED, so any fresh
    * worktree of a post-round-14 tree carries it and runs gated — an
    * A/B against an older tree is gate-ASYMMETRIC unless both
    * worktrees delete the file first (or point this loader elsewhere);
    * symmetric A/B protocol = `rm baseline_rows.json` in both trees. */
  def loadQueryBaseline(
      path: String = DefaultPath): Map[String, Double] =
    root(path).fold(Map.empty[String, Double]) { r =>
      val it = r.path("queries").fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    }

  /** Per-stage budgets from the `stage_budgets` map:
    * pipeline -> (stage -> seconds at sf0.1). */
  def loadStageBudgets(
      path: String = DefaultPath): Map[String, Map[String, Double]] =
    root(path).fold(Map.empty[String, Map[String, Double]]) { r =>
      val pit = r.path("stage_budgets").fields()
      val pb = Map.newBuilder[String, Map[String, Double]]
      while (pit.hasNext) {
        val pe = pit.next()
        val sit = pe.getValue.fields()
        val sb = Map.newBuilder[String, Double]
        while (sit.hasNext) {
          val se = sit.next()
          sb += se.getKey -> se.getValue.asDouble()
        }
        pb += pe.getKey -> sb.result()
      }
      pb.result()
    }

  /** The sweep-outlier predicate, extracted so BenchSpec can assert
    * it on planted values: names of queries whose sweep measurement
    * exceeds `factor` x their baseline row (queries with no row are
    * never flagged — an absent row is "no gate", not "gate at 0"). */
  def flagged(results: Seq[(String, Double)],
      baseline: Map[String, Double],
      factor: Double = 1.5): Seq[String] =
    results.collect {
      case (n, v) if baseline.get(n).exists(b => v > factor * b) => n
    }
}
