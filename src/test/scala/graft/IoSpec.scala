package graft

import java.nio.file.Files
import graft.sources.{Readers, Writers}
import org.apache.spark.sql.functions._

/** Reference-domain fixtures (FIXTURES.md B1–B3) + reader/writer specs. */
object Fixtures {
  // 8 items × up to 6 sites, some missing combos, one malformed row
  val sites = Seq("enwiki", "dewiki", "frwiki", "eswiki", "itwiki", "ptwiki")

  def sitelinksTsv: String = {
    val rows = for {
      q <- 1 to 8
      (s, i) <- sites.zipWithIndex
      if (q + i) % 3 != 0 // holes: items missing in some sites
    } yield s"Q$q\t$s\tTitle_${q}_$s"
    // malformed = MORE columns than the schema (fewer just reads as
    // nulls in permissive CSV; extra columns trip DROPMALFORMED)
    ("id\tsite\ttitle" +: rows :+ "BAD\tROW\tWITH\tTOO\tMANY\tCOLS")
      .mkString("\n")
  }

  def pagecountsSsv: String = {
    val rows = for {
      q <- 1 to 8
      (s, i) <- sites.zipWithIndex
      if (q + i) % 4 != 0 // different holes: zero-view articles exist
    } yield {
      val z = s.stripSuffix("wiki") + ".z"
      s"$z Title_${q}_$s ${(q * 10 + i).toDouble}"
    }
    // non-.z rows that the project-total filter must drop:
    val nonTotals = Seq("en Title_1_enwiki 999", "de Title_2_dewiki 999")
    (rows ++ nonTotals).mkString("\n")
  }

  def rawDataTsv: String = {
    // leading unnamed index column like the reference's checked-in
    // lite fixture (header starts with a tab)
    val rows = for {
      q <- 1 to 8
      (s, i) <- sites.zipWithIndex
      if (q + i) % 3 != 0
    } yield s"${q * 10 + i}\tQ$q\t$s\tTitle_${q}_$s\t${(q * 10 + i).toDouble}"
    ("\tid\tsite\ttitle\tpageviews" +: rows).mkString("\n")
  }

  def write(dir: String): (String, String, String) = {
    val sl = s"$dir/sitelinks.tsv"
    val pc = s"$dir/pagecounts"
    val rd = s"$dir/rawdata.tsv"
    Files.writeString(java.nio.file.Paths.get(sl), sitelinksTsv)
    Files.writeString(java.nio.file.Paths.get(pc), pagecountsSsv)
    Files.writeString(java.nio.file.Paths.get(rd), rawDataTsv)
    (sl, pc, rd)
  }
}

class IoSpec extends SparkSpec {

  lazy val dir: String = Files.createTempDirectory("graft-io").toString
  lazy val (slPath, pcPath, rdPath) = Fixtures.write(dir)

  test("sitelinks TSV: header honored, malformed row dropped") {
    val ds = Readers.sitelinks(spark, slPath)
    // collect (all columns) on purpose: with CSV column pruning a
    // count() reads no columns and DROPMALFORMED never sees the bad row
    val rows = ds.collect()
    assert(rows.length == Fixtures.sitelinksTsv.linesIterator.size - 2)
    assert(rows.forall(_.id.startsWith("Q")))
  }

  test("pagecounts: space-separated, .z filter + wiki rewrite") {
    val pc = Readers.pagecounts(spark, pcPath)
    val totals = Readers.projectTotals(pc)
    assert(totals.filter(!col("site").endsWith("wiki")).count() == 0)
    assert(totals.count() == pc.count() - 2) // the two non-.z rows
  }

  test("parseRaw: inner join drops zero-view articles") {
    val parsed = Readers.parseRaw(spark, slPath, pcPath)
    val sl = Readers.sitelinks(spark, slPath).count()
    assert(parsed.count() > 0 && parsed.count() < sl)
    // every surviving row has a positive pageview count
    assert(parsed.filter(col("pageviews") <= 0).count() == 0)
  }

  test("rawData TSV tolerates the leading unnamed index column") {
    val ds = Readers.rawData(spark, rdPath)
    assert(ds.columns.toSeq == Seq("id", "site", "title", "pageviews"))
    assert(ds.count() == Fixtures.rawDataTsv.linesIterator.size - 1)
  }

  test("badRecords surfaces the malformed row permissively, no cache") {
    // order-independent leak check: only assert the empty→non-empty
    // transition caused by THIS call (another suite's session-shared
    // cache entry must not fail this test)
    val cleanBefore = spark.sharedState.cacheManager.isEmpty
    val bad = Readers.badRecords(
      spark, slPath, Readers.sitelinkSchema, "\t")
    assert(bad.count() == 1)
    assert(!(cleanBefore && !spark.sharedState.cacheManager.isEmpty),
      "badRecords leaked a cached plan")
  }

  test("parquet round-trip and ErrorIfExists semantics") {
    val out = s"$dir/parsed_parquet"
    val parsed = Readers.parseRaw(spark, slPath, pcPath).toDF()
    Writers.parquet(parsed, out)
    val back = Readers.parsedParquet(spark, out)
    assert(back.count() == parsed.count())
    intercept[Exception](Writers.parquet(parsed, out))
  }

  test("orc round-trip: values survive, filters push into the scan") {
    val out = s"$dir/events_orc"
    Writers.orc(tables.events, out)
    val back = Readers.orc(spark, out)
    assert(back.count() == tables.events.count())
    val filtered = back.filter(col("user_id") === 7)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]")
      || scan.contains("EqualTo(user_id,7)"),
      s"user_id filter not pushed into the ORC scan:\n$scan")
    assert(filtered.count() ==
      tables.events.filter(col("user_id") === 7).count())
    intercept[Exception](Writers.orc(tables.events, out))
  }

  test("jsonLines round-trip with declared schema; malformed line dropped") {
    val out = s"$dir/docs_jsonl"
    Writers.jsonLines(tables.documents, out)
    val schema = tables.documents.schema
    val back = Readers.jsonLines(spark, out, schema)
    assert(back.count() == tables.documents.count())
    assert(back.schema == schema)
    // a raw malformed line among valid JSONL: DROPMALFORMED skips it
    val mixed = s"$dir/docs_mixed.jsonl"
    val w = new java.io.PrintWriter(mixed, "UTF-8")
    try {
      w.println("""{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}""")
      w.println("""{"doc_id": broken not json""")
      w.println("""{"doc_id": 2, "text": "ok too", "lang": "de", "source": "s", "n_chars": 6}""")
    } finally w.close()
    val docs = Readers.jsonLines(spark, mixed, schema)
      .select("doc_id", "text", "lang")
    assert(docs.count() == 2, "malformed line must be dropped")
  }

  test("partitioned parquet prunes partitions on read") {
    val out = s"$dir/events_part"
    Writers.parquetPartitioned(
      tables.events.withColumn("etype", col("event_type")),
      out, Seq("etype"))
    val pruned = spark.read.parquet(out).filter(col("etype") === "click")
    // physical reading only the click directory: scanned files all
    // live under etype=click
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("etype=click")))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")
    Writers.bucketed(tables.orders, "orders_b", 8, "o_custkey")
    Writers.bucketed(tables.customer, "cust_b", 8, "c_custkey")
    // force the sort-merge path (at test scale the planner would just
    // broadcast the small side and skip bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("cust_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"bucketed scan not used:\n$plan")
      assert(joined.count() == tables.orders.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("catalog registration: testdata tables addressable by name") {
    graft.sources.Warehouse.registerTables(spark, sfDir)
    assert(spark.catalog.tableExists("graft.lineitem"))
    assert(spark.sql("SELECT count(*) AS n FROM graft.region")
      .collect()(0).getLong(0) == 5)
  }

  test("catalog re-registration with another sf dir re-points tables") {
    graft.sources.Warehouse.registerTables(spark, sfDir)
    val n1 = spark.sql("SELECT count(*) FROM graft.lineitem")
      .collect()(0).getLong(0)
    // same JVM, different dir: tables must follow, not silently serve
    // the first dir's data
    graft.sources.Warehouse.registerTables(spark, "/root/testdata/sf0.01")
    val n2 = spark.sql("SELECT count(*) FROM graft.lineitem")
      .collect()(0).getLong(0)
    assert(n2 > n1, s"expected sf0.01 rows > sf0.001 rows, got $n2 vs $n1")
    // restore for any later test in this JVM
    graft.sources.Warehouse.registerTables(spark, sfDir)
  }

  test("events_hourly catalog table prunes year/month/day partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val table = graft.sources.Warehouse.ensureEventsHourly(spark, sfDir)
    // AQE off for the assertion only: query stages hide the scan node
    // from collectLeaves; the pruning itself is identical either way
    def scanOf(sql: String): FileSourceScanExec =
      spark.sql("SET spark.sql.adaptive.enabled=false").sparkSession
        .sql(sql) match { case df =>
          df.collect()
          df.queryExecution.executedPlan.collectLeaves()
            .collectFirst { case f: FileSourceScanExec => f }.get
        }
    val pruned =
      try scanOf(s"SELECT ROUND(SUM(value), 2) FROM $table " +
        "WHERE year = 2024 AND month = 1 AND day <= 7")
      finally ()
    val full =
      try scanOf(s"SELECT ROUND(SUM(value), 2) FROM $table")
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the pruning shows up in the scan node itself…
    assert(pruned.toString.contains("PartitionFilters"),
      s"no PartitionFilters in:\n$pruned")
    // …and in what was actually read: ≤7 day-directories vs the
    // whole table
    val prunedParts = pruned.metrics("numPartitions").value
    val fullParts = full.metrics("numPartitions").value
    assert(prunedParts >= 1 && prunedParts <= 7, s"read $prunedParts")
    assert(fullParts > prunedParts, s"$fullParts vs $prunedParts")
  }

  test("csv sink: single-file mode writes exactly one part file") {
    val out = s"$dir/csv_single"
    Writers.csv(
      Readers.parseRaw(spark, slPath, pcPath).toDF(), out, singleFile = true)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    assert(parts(0).getName.endsWith(".csv.bz2"))
  }

  test("rangeSorted: files cover disjoint key intervals") {
    val out = s"$dir/range_sorted"
    val events = tables.events.select("event_id", "user_id", "value")
    Writers.rangeSorted(events, out, "event_id", numFiles = 4)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    assert(parts.length >= 2, s"expected multiple files, got ${parts.length}")
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("event_id"), max("event_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $hi >= $lo2")
      case _ =>
    }
    // content preserved
    assert(spark.read.parquet(out).exceptAll(events).count() == 0)
    assert(events.exceptAll(spark.read.parquet(out)).count() == 0)
  }

  test("zOrdered: files cover disjoint z-ranges and tight rectangles " +
    "on BOTH keys") {
    // balanced 256x256 grid: with 16 files the top four z bits split
    // each dimension 4-ways, so every file's bounding rectangle must
    // span ~1/4 of EACH key domain (a 1-D sort on `a` would leave
    // every file spanning the full b domain)
    val out = s"$dir/z_ordered"
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).as("a"), (col("id") / 256).cast("long").as("b"))
    Writers.zOrdered(grid, out, "a", "b", numFiles = 16)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    assert(parts.length >= 8, s"expected ~16 files, got ${parts.length}")
    val boxes = parts.map { p =>
      val r = spark.read.parquet(p).agg(
        min(Writers.zValue(col("a"), col("b"))),
        max(Writers.zValue(col("a"), col("b"))),
        min("a"), max("a"), min("b"), max("b")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
    // z-ranges disjoint across files (the rangeSorted invariant on z)
    boxes.sortBy(_._1).sliding(2).foreach {
      case Array(x, y) => assert(x._2 < y._1,
        s"overlapping z ranges: ${x._2} >= ${y._1}")
      case _ =>
    }
    val avgASpan = boxes.map(b => (b._4 - b._3).toDouble).sum / boxes.length
    val avgBSpan = boxes.map(b => (b._6 - b._5).toDouble).sum / boxes.length
    assert(avgASpan < 0.5 * 255,
      s"a spans not narrowed: $avgASpan vs 255")
    assert(avgBSpan < 0.5 * 255,
      s"b spans not narrowed: $avgBSpan vs 255")
    // content preserved on a real table round-trip
    val li = tables.lineitem.select("l_partkey", "l_suppkey", "l_quantity")
    Writers.zOrdered(li, s"$out-li", "l_partkey", "l_suppkey",
      numFiles = 8)
    assert(spark.read.parquet(s"$out-li").exceptAll(li).count() == 0)
    assert(li.exceptAll(spark.read.parquet(s"$out-li")).count() == 0)
  }

  test("zValue: Morton interleave is exact on crafted bit patterns") {
    import spark.implicits._
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
        ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1))
      .toDF("a", "b")
      .select(Writers.zValue(col("a"), col("b")))
      .as[Long].collect().toSeq
    def interleave(a: Long, b: Long): Long =
      (0 until 31).foldLeft(0L)((acc, i) =>
        acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1)))
    val exp = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      ((1L << 31) - 1, 0L), (0L, (1L << 31) - 1)).map((interleave _).tupled)
    assert(got == exp)
    assert(exp(1) == 1L && exp(2) == 2L) // bit placement sanity
    assert(exp.forall(_ >= 0L), "z must stay out of the sign bit")
  }

  test("zOrderedN: 3-column layout narrows every file's rectangle on " +
    "ALL THREE keys; unequal budgets are bit-exact") {
    // balanced 32x32x32 grid (15 interleave bits): with 64 files the
    // top six z bits split each dimension 4-ways, so every file's
    // bounding box must span ~1/4 of EACH key domain (a 1-D or 2-D
    // sort would leave some dimension's span at the full domain)
    val out = s"$dir/z_ordered_3"
    val grid = spark.range(0, 32768).select(
      (col("id") % 32).as("a"),
      ((col("id") / 32) % 32).cast("long").as("b"),
      (col("id") / 1024).cast("long").as("c"))
    Writers.zOrderedN(grid, out, Seq("a" -> 5, "b" -> 5, "c" -> 5),
      numFiles = 64)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
    assert(parts.length >= 32, s"expected ~64 files, got ${parts.length}")
    val boxes = parts.map { p =>
      val r = spark.read.parquet(p).agg(
        min("a"), max("a"), min("b"), max("b"), min("c"), max("c"))
        .collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
    def avgSpan(lo: ((Long, Long, Long, Long, Long, Long)) => Long,
        hi: ((Long, Long, Long, Long, Long, Long)) => Long) =
      boxes.map(b => (hi(b) - lo(b)).toDouble).sum / boxes.length
    assert(avgSpan(_._1, _._2) < 0.5 * 31, "a spans not narrowed")
    assert(avgSpan(_._3, _._4) < 0.5 * 31, "b spans not narrowed")
    assert(avgSpan(_._5, _._6) < 0.5 * 31, "c spans not narrowed")
    // unequal budgets: exhausted columns drop out and survivors pack
    // tighter — verify against a reference interleave
    import spark.implicits._
    def ref(vals: Seq[Long], bits: Seq[Int]): Long = {
      var pos = 0; var acc = 0L
      for (i <- 0 until bits.max; c <- vals.indices if i < bits(c)) {
        acc |= ((vals(c) >> i) & 1L) << pos; pos += 1
      }
      acc
    }
    val cases = Seq((3L, 1L, 5L), (7L, 3L, 31L), (0L, 0L, 1L << 7),
      ((1L << 31) - 1, 3L, 255L))
    val got = cases.toDF("a", "b", "c").select(
      Writers.zValueN(Seq(col("a"), col("b"), col("c")), Seq(31, 2, 8)))
      .as[Long].collect().toSeq
    val exp = cases.map { case (a, b, c) =>
      ref(Seq(a, b, c), Seq(31, 2, 8)) }
    assert(got == exp)
    assert(got.forall(_ >= 0L), "z must stay out of the sign bit")
    // and the 2-col zValue is EXACTLY the n=2 equal-budget case
    val z2 = Seq((3L, 5L)).toDF("a", "b")
      .select(Writers.zValue(col("a"), col("b")),
        Writers.zValueN(Seq(col("a"), col("b")), Seq(31, 31)))
      .collect()(0)
    assert(z2.getLong(0) == z2.getLong(1))
  }

  test("zOrdered rejects keys outside [0, 2^31) instead of silently " +
    "corrupting the layout") {
    import spark.implicits._
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    val bad = Seq((1L, 1L << 31), (2L, 3L)).toDF("a", "b")
    val e = intercept[Exception] {
      Writers.zOrdered(bad, s"$dir/z_bad", "a", "b", numFiles = 2)
    }
    assert(messages(e).exists(_.contains("zOrdered: key out of")),
      s"unexpected error: $e")
    // a NULL key must fail with the same loud message, not a
    // NULL-propagated empty one
    val withNull = Seq((Some(1L), Some(2L)), (Some(3L), None))
      .toDF("a", "b")
    val e2 = intercept[Exception] {
      Writers.zOrdered(withNull, s"$dir/z_null", "a", "b", numFiles = 2)
    }
    assert(messages(e2).exists(_.contains("zOrdered: key out of")),
      s"unexpected error: $e2")
  }

  test("compact: collapses a small-file directory, preserves content") {
    val out = s"$dir/compact_me"
    val events = tables.events.select("event_id", "user_id", "value")
    events.repartition(64).write.parquet(out)
    def partFiles = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("part-"))
    assert(partFiles == 64)
    Writers.compact(spark, out, targetBytes = 1024L * 1024 * 1024)
    assert(partFiles == 1, s"expected 1 file after compaction, got $partFiles")
    val back = spark.read.parquet(out)
    assert(back.exceptAll(events).count() == 0 &&
      events.exceptAll(back).count() == 0)
    // no temp/old residue
    assert(!new java.io.File(out + "._compact_tmp").exists())
    assert(!new java.io.File(out + "._compact_old").exists())
  }

  test("compact recovers from a simulated mid-swap crash") {
    val out = s"$dir/compact_crash"
    val events = tables.events.select("event_id", "user_id")
    events.repartition(8).write.parquet(out)
    // simulate the crash window: data renamed away, tmp never swapped in
    val f = new java.io.File(out)
    val old = new java.io.File(out + "._compact_old")
    assert(f.renameTo(old))
    Writers.compact(spark, out, targetBytes = 1024L * 1024 * 1024)
    val back = spark.read.parquet(out)
    assert(back.exceptAll(events).count() == 0 &&
      events.exceptAll(back).count() == 0)
    assert(!old.exists())
  }

  test("evolvedParquet: mergeSchema unions schemas, null-fills old files") {
    import spark.implicits._
    val out = s"$dir/evolving"
    Seq((1L, "a")).toDF("id", "old_col").write.parquet(out)
    Seq((2L, 9.5)).toDF("id", "new_col")
      .write.mode("append").parquet(out)
    val merged = Readers.evolvedParquet(spark, out)
    assert(merged.columns.sorted.toSeq == Seq("id", "new_col", "old_col"))
    // access by NAME: mergeSchema makes no column-order guarantee
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[String]("old_col") == "a" &&
      rows(0).isNullAt(rows(0).fieldIndex("new_col")))
    assert(rows(1).getAs[Double]("new_col") == 9.5 &&
      rows(1).isNullAt(rows(1).fieldIndex("old_col")))
  }

  test("compact rewrites a many-small-files directory into few files " +
    "with content byte-identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact_").toString + "/t"
    val df = (0 until 5000).map(i => (i.toLong, s"row_$i"))
      .toDF("id", "payload")
    df.repartition(40).write.parquet(dir)
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() == 40)
    val nOut = Writers.compact(spark, dir, targetBytes = 512L * 1024)
    assert(parquetFiles() == nOut && nOut < 40)
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // swap debris cleaned up
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains("_compact_")))
  }

  test("compact crash recovery: a stranded ._compact_old restores " +
    "before recompaction; old+current together fail loudly") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_compact2_").toString
    val dir = s"$base/t"
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(4).write.parquet(dir)
    // simulate a crash between the two swap renames: data only in old
    new java.io.File(dir).renameTo(new java.io.File(dir + "._compact_old"))
    assert(!new java.io.File(dir).exists())
    val n = Writers.compact(spark, dir, targetBytes = 1L << 30)
    assert(n == 1L)
    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    // both current AND old present -> refuse (post-swap crash needs a
    // human look, not silent data loss)
    df.limit(10).write.parquet(dir + "._compact_old")
    val e = intercept[IllegalArgumentException] {
      Writers.compact(spark, dir)
    }
    assert(e.getMessage.contains("prior compaction crashed"))
  }

  test("purgeKeys drops exactly the keyed rows and rewrites ONLY the " +
    "files containing hits (file-pruning proof via untouched names)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_purge_").toString + "/t"
    // 4 files, ids partitioned by range so hits land in known files
    val df = (0L until 400L).map(i => (i, s"payload_$i")).toDF("id", "v")
    df.repartitionByRange(4, col("id")).write.parquet(dir)
    def files() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    val before = files()
    assert(before.size == 4)
    // keys 10 and 20 live in the first range file only
    val dropped = Writers.purgeKeys(spark, dir, "id",
      Seq(10L, 20L, 999999L).toDF("k"))
    assert(dropped == 2L)
    val after = files()
    // exactly one original file replaced; the other three untouched
    val untouched = before.keySet & after.keySet
    assert(untouched.size == 3, s"$before -> $after")
    untouched.foreach(n => assert(before(n) == after(n)))
    assert((after.keySet -- before.keySet).forall(_.startsWith("purge-")))
    val back = spark.read.parquet(dir)
    assert(back.count() == 398)
    assert(back.filter(col("id").isin(10L, 20L)).isEmpty)
    // remaining rows byte-identical
    assert(back.exceptAll(df.filter(!col("id").isin(10L, 20L))).isEmpty)
    // no-hit fast path: nothing changes, 0 returned
    assert(Writers.purgeKeys(spark, dir, "id", Seq(777777L).toDF("k")) == 0L)
    assert(files() == after)
  }

  test("purgeKeys crash recovery: a manifest with missing adds rolls " +
    "BACK (old files intact); with all adds present it rolls FORWARD " +
    "(old files finish deleting)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_purge2_").toString + "/t"
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    df.coalesce(1).write.parquet(dir)
    val orig = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    def write(p: String, s: String): Unit = {
      val w = new java.io.FileWriter(p); w.write(s); w.close()
    }
    // --- roll back: manifest promises two adds, only one (partial)
    // landed — every moved-in file is manifest-listed by construction
    write(s"$dir/._purge_manifest",
      s"D $orig\nA ghost.parquet\nA partial.parquet")
    write(s"$dir/purge-partial.parquet", "junk")
    assert(Writers.purgeKeys(spark, dir, "id",
      Seq(424242L).toDF("k")) == 0L)
    assert(new java.io.File(s"$dir/$orig").exists())
    assert(!new java.io.File(s"$dir/purge-partial.parquet").exists())
    assert(!new java.io.File(s"$dir/._purge_manifest").exists())
    assert(spark.read.parquet(dir).count() == 100)
    // --- roll forward: all adds present, old file still there
    val replacement =
      Files.createTempDirectory("graft_purge3_").toString + "/r"
    df.filter(col("id") =!= 5L).coalesce(1).write.parquet(replacement)
    val newPart = new java.io.File(replacement).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(newPart.toPath,
      java.nio.file.Paths.get(s"$dir/purge-${newPart.getName}"))
    write(s"$dir/._purge_manifest", s"D $orig\nA ${newPart.getName}")
    assert(Writers.purgeKeys(spark, dir, "id",
      Seq(424242L).toDF("k")) == 0L)
    assert(!new java.io.File(s"$dir/$orig").exists())
    val back = spark.read.parquet(dir)
    assert(back.count() == 99 && back.filter(col("id") === 5L).isEmpty)
  }

  test("jsonlRoundtrip: hostile text survives JSON escaping; corrupt " +
    "lines route with recovered ids; fixture counts are exact") {
    val spark2 = spark
    import spark2.implicits._
    // quotes, backslashes, tabs, newlines, unicode — the characters a
    // naive line writer corrupts
    val hostile = "say \"hi\" \\ twice\nand\taé more"
    val docs = Seq(
      (0L, "gone", "xx", "s1", 4L), // 0 % 23 == 0 -> planted corrupt
      (1L, hostile, "en", "s1", hostile.length.toLong),
      (2L, "plain text", "de", "s2", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.sources.Formats.jsonlRoundtrip(spark, docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("corrupt") == 1L)
    assert(got(0L).isNullAt(2) && got(0L).isNullAt(5)) // lang, text_md5
    assert(got(1L).getAs[Long]("corrupt") == 0L)
    val wantMd5 = docs.filter(col("doc_id") === 1L)
      .select(md5(col("text"))).head.getString(0)
    assert(got(1L).getAs[String]("text_md5") == wantMd5)
    assert(got(1L).getAs[String]("lang") == "en" &&
      got(1L).getAs[Long]("n_chars") == hostile.length.toLong)
    // fixture-wide: one output row per input line, corrupt set exact
    val fx = graft.sources.Formats.jsonlRoundtrip(spark, tables.documents)
      .collect()
    assert(fx.length == tables.documents.count())
    fx.foreach { r =>
      val id = r.getLong(0)
      assert(r.getAs[Long]("corrupt") == (if (id % 23 == 0) 1L else 0L))
      assert(r.isNullAt(5) == (id % 23 == 0))
    }
  }

  test("orcRoundtrip: ORC write→read preserves schema and rows; the " +
    "range predicate reaches the ORC scan as a pushed filter") {
    val dir = Files.createTempDirectory("orc-spec").toString + "/li"
    val src = tables.lineitem.select("l_orderkey", "l_quantity",
      "l_returnflag")
    src.write.mode("overwrite").orc(dir)
    val back = Readers.orc(spark, dir)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    // pushdown: the filter must appear in the ORC scan node
    val plan = back.filter(col("l_quantity") >= 25.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity,25.0)"),
      s"no pushed filter in:\n$plan")
    // the declared gate's aggregate equals the parquet-side compute
    val viaOrc = graft.sources.Formats.orcRoundtrip(spark, tables)
      .collect().toSeq
    val direct = tables.lineitem.filter(col("l_quantity") >= 25.0)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          2).as("revenue"),
        round(avg("l_tax"), 4).as("avg_tax"))
      .orderBy("l_returnflag", "l_linestatus").collect().toSeq
    assert(viaOrc == direct)
  }
}
