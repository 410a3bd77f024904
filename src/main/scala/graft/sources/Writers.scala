package graft.sources

import java.text.SimpleDateFormat
import java.util.Date
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions.{col, lit, shiftleft}

/** Sink surface (SURVEY §2.1 S6–S9): parquet stage persistence,
  * single-file CSV output, and the timestamped output layout.
  */
object Writers {

  /** S6 — parquet save, fail-if-exists (reference
    * DataGatherer.scala:18-19, FeatureExtractor.scala:25-26). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.ErrorIfExists).parquet(path)

  /** S7 — CSV sink with header + bzip2. `singleFile = true` reproduces
    * the reference's `coalesce(1)` (ScorePredictor.scala:51-56) — a
    * deliberate single-writer bottleneck, so it is opt-in only; the
    * default writes one file per partition (the 100 TB path). */
  def csv(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode(SaveMode.ErrorIfExists)
      .option("header", "true")
      .option("compression", "bzip2")
      .csv(path)
  }

  /** ORC sink (zstd) — columnar alternative for ORC-native warehouses. */
  def orc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.ErrorIfExists)
      .option("compression", "zstd")
      .orc(path)

  /** JSON-lines sink (gzip) — the corpus interchange/export format; one
    * file per partition, no single-writer funnel. */
  def jsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.ErrorIfExists)
      .option("compression", "gzip")
      .json(path)

  /** Partitioned parquet layout — the 100 TB default: directory
    * partitioning on low-cardinality columns so Catalyst's
    * PruneFileSourcePartitions turns partition predicates into skipped
    * directories (the same pruning the reference leaned on for
    * `pageview_hourly`'s year/month/day, DataGatherer.scala:71). */
  def parquetPartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.ErrorIfExists)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table — pre-shuffled storage: joins/aggregations
    * on the bucket key read co-located buckets and plan NO shuffle
    * exchange on the bucketed sides (asserted in IoSpec). This is how a
    * fact table joined repeatedly on the same key amortizes its shuffle
    * at 100 TB: pay it once at write time. */
  def bucketed(
      df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Range-sorted parquet write — the data-skipping layout: rows are
    * range-partitioned AND sorted within partitions on `sortCol`, so
    * every output file covers a disjoint, tight min/max interval of the
    * key. Parquet stores those min/max in footers/row-group stats, and
    * any reader filtering on `sortCol` skips whole files without
    * opening them — the poor-man's zone map / Z-order for a single
    * dimension, and the highest-leverage layout decision a 100 TB table
    * owner makes (a timestamp-sorted event log turns every time-range
    * query into a file-count problem instead of a scan problem).
    * Disjointness is asserted per-file in IoSpec. */
  def rangeSorted(
      df: DataFrame, path: String, sortCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.ErrorIfExists).parquet(path)

  /** Morton (Z-order) interleave of n non-negative integer columns
    * with PER-COLUMN bit budgets (`bits(c)` low bits of column c
    * participate; Σbits ≤ 62 keeps the result out of the long sign
    * bit, so signed-long comparison IS Morton order). Bit i of each
    * column is placed in round-robin order at ascending output
    * positions — columns whose budget is exhausted drop out and the
    * survivors pack tighter, so unequal budgets (a 31-bit key next to
    * a 16-bit enum) waste no positions. For n=2 with equal budgets
    * this is the classic interleave: bit i of col 0 → position 2i,
    * bit i of col 1 → 2i+1. A pure Column fold — codegen'd, no UDF.
    *
    * The dominant n=2-equal-budget case routes through the fused
    * native [[graft.functions.InterleaveBits]] expression (12
    * shift-ands per row instead of a 2·Σbits-term fold); the general
    * fold remains the reference semantics — ZOrderSpec pins the two
    * paths equal bit-for-bit. */
  def zValueN(cols: Seq[Column], bits: Seq[Int]): Column = {
    require(cols.nonEmpty && cols.length == bits.length,
      s"zValueN: ${cols.length} columns vs ${bits.length} bit budgets")
    require(bits.forall(_ >= 1), s"zValueN: bit budgets must be >= 1")
    require(bits.sum <= 62,
      s"zValueN: total bits ${bits.sum} > 62 overflows the sign bit")
    if (cols.length == 2 && bits(0) == bits(1) && bits(0) <= 31)
      return graft.functions.ZOrderFunctions.interleave_bits(
        cols(0).cast("long"), cols(1).cast("long"), bits(0))
    val longs = cols.map(_.cast("long"))
    var pos = 0
    var acc = lit(0L)
    for (i <- 0 until bits.max; c <- cols.indices if i < bits(c)) {
      // bit i of column c → output position pos; pos >= i always (at
      // least one column is active at every lower level), so the
      // shift is non-negative
      acc = acc.bitwiseOR(
        shiftleft(longs(c).bitwiseAND(lit(1L << i)), pos - i))
      pos += 1
    }
    acc
  }

  /** Classic 2-D Morton interleave — [[zValueN]] with two 31-bit
    * budgets (any non-negative 32-bit SIGNED int). */
  def zValue(a: Column, b: Column): Column =
    zValueN(Seq(a, b), Seq(31, 31))

  /** [[zValueN]] with the per-column [0, 2^bits) input contract
    * ENFORCED per row: out-of-range keys fail the write loudly
    * instead of silently interleaving garbage into the layout. The
    * guard is a codegen'd conditional — zero cost unless violated. */
  private def zValueNChecked(
      cols: Seq[Column], bits: Seq[Int]): Column = {
    import org.apache.spark.sql.functions.{coalesce, concat, raise_error, when}
    val ok = cols.zip(bits).map { case (c, nb) =>
      c.isNotNull && c.cast("long").between(0L, (1L << nb) - 1)
    }.reduce(_ && _)
    // coalesce: a NULL key must still produce the loud message, not a
    // NULL-propagated empty error
    val shown = cols.map(c => coalesce(c.cast("string"), lit("null")))
      .flatMap(c => Seq(lit(", "), c)).drop(1)
    when(ok, zValueN(cols, bits)).otherwise(
      raise_error(concat(
        lit(s"zOrdered: key out of [0, 2^{${bits.mkString(",")}}): (")
          +: shown :+ lit(")"): _*)))
  }

  /** Z-ORDERED layout — the 2-D generalization of [[rangeSorted]]
    * (Delta/Iceberg `OPTIMIZE ZORDER BY` shape): rows are range-
    * partitioned and sorted on the Morton interleave of two key
    * columns, so every parquet file covers a small RECTANGLE of the
    * (a, b) key space rather than a stripe of one key. Zone maps
    * (parquet min/max on both raw columns) then prune files for range
    * predicates on EITHER key — a selective filter on `a` or on `b`
    * touches ~√files instead of all of them, which is the difference
    * between a point lookup and a full scan on a 100 TB table. Both
    * columns must be non-negative and fit in 32 bits (the usual
    * dictionary-key contract; wider keys need a rank-compression pass
    * first). */
  def zOrdered(
      df: DataFrame, path: String, colA: String, colB: String,
      numFiles: Int): Unit =
    zOrderedN(df, path, Seq(colA -> 31, colB -> 31), numFiles)

  /** n-column Z-ORDERED layout: [[zOrdered]] generalized to any
    * number of keys, each with its own bit budget (Σ ≤ 62). Every
    * parquet file covers a small HYPER-RECTANGLE of the key space, so
    * zone maps prune for range predicates on ANY participating key.
    * Budget sizing is the layout-design lever: give each column
    * ⌈log₂(domain)⌉ bits — a 31-bit surrogate key next to an 8-bit
    * status code packs 39 interleave levels instead of padding the
    * code to 31 and diluting the key's locality. */
  def zOrderedN(
      df: DataFrame, path: String, keys: Seq[(String, Int)],
      numFiles: Int): Unit = {
    val (names, bits) = keys.unzip
    df.withColumn("_z", zValueNChecked(names.map(df.col), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.ErrorIfExists).parquet(path)
  }

  /** Small-file compaction — the operational counterpart to streaming
    * and incremental sinks, which accrete many small files that rot
    * scan performance (footer/open overhead dominates) and overload
    * the file listing. Rewrites a parquet directory into
    * `ceil(bytes / targetBytes)` files (size-aware, never fewer than
    * one), preserving content exactly; atomically swaps via a temp dir
    * next to the target so a crash leaves either old or new layout. */
  def compact(
      spark: org.apache.spark.sql.SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(path + "._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(path + "._compact_old")
    // a prior crash can strand tmp (never renamed in — safe to drop)
    // or old (the ORIGINAL data after a crash mid-swap — restore it
    // before proceeding rather than silently compacting on top)
    if (fs.exists(tmp)) fs.delete(tmp, true)
    if (fs.exists(old)) {
      require(!fs.exists(hadoopPath),
        s"both $path and $old exist — prior compaction crashed " +
          "post-swap; delete the stale ._compact_old after inspection")
      require(fs.rename(old, hadoopPath),
        s"failed to restore $old to $path")
    }
    val bytes = fs.getContentSummary(hadoopPath).getLength
    val files = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    spark.read.parquet(path)
      .repartition(files.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // every rename is checked: an unchecked false here would report
    // success over a silent no-op. The two-step swap is not atomic —
    // a crash between the renames leaves data only in ._compact_old,
    // which the recovery block above restores on the next call.
    require(fs.rename(hadoopPath, old), s"rename $path -> $old failed")
    require(fs.rename(tmp, hadoopPath), s"rename $tmp -> $path failed")
    fs.delete(old, true)
    files
  }

  /** Targeted-delete rewrite (the GDPR right-to-erasure shape, public
    * Delta-Lake DELETE semantics re-expressed on plain parquet): drop
    * every row whose `keyCol` appears in `keys`, touching ONLY the
    * files that contain a hit — at 100 TB an erasure request hits a
    * handful of files and rewriting the table for it is absurd; file
    * pruning is what makes at-rest deletion tractable.
    *
    * Mechanics: one scan joined to the (broadcast) key set identifies
    * the hit files (`input_file_name`); those files re-read,
    * anti-joined, and written to a temp dir; then a MANIFEST commit
    * (the DedupLedger discipline) makes the multi-file swap crash-
    * safe: the manifest records files-to-delete + files-to-add and is
    * written BEFORE any destructive step. Recovery on the next call
    * rolls the interrupted swap forward if every new file already
    * landed, and rolls it back otherwise — either way the directory
    * returns to a consistent state (old data intact, or new data
    * complete; never half). Returns the number of rows dropped.
    *
    * The `keys` frame collects nothing; only the HIT FILE LIST comes
    * to the driver (bounded by file count — the Warehouse partition-
    * listing precedent). */
  def purgeKeys(
      spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String, keys: DataFrame): Long = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions.{broadcast, input_file_name}
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverPurge(fs, path)
    val keySet = keys.select(col(keys.columns.head).as("__k")).distinct()
    val hitFiles = spark.read.parquet(path)
      .withColumn("__f", input_file_name())
      .join(broadcast(keySet), col(keyCol) === col("__k"))
      .select("__f").distinct()
      .collect().map(_.getString(0)) // bounded by |files touched|
    if (hitFiles.isEmpty) return 0L
    val tmp = s"$path/._purge_tmp"
    val touched = spark.read.parquet(hitFiles: _*)
    val kept = touched.join(broadcast(keySet),
      col(keyCol) === col("__k"), "left_anti")
    val dropped = touched.count() - kept.count()
    kept.write.mode(SaveMode.Overwrite).parquet(tmp)
    val newFiles = fs.listStatus(new Path(tmp)).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    // manifest BEFORE any destructive step: the commit point
    val manifest = new Path(path, "._purge_manifest")
    val oldNames = hitFiles.map(f => new Path(f).getName)
    writeText(fs, manifest,
      (oldNames.map("D " + _) ++ newFiles.map("A " + _)).mkString("\n"))
    // move new files in under purge-unique names, delete old, cleanup
    newFiles.foreach { n =>
      require(fs.rename(new Path(tmp, n), new Path(path, s"purge-$n")),
        s"purgeKeys: rename of $n failed")
    }
    oldNames.foreach(n => fs.delete(new Path(path, n), false))
    fs.delete(new Path(tmp), true)
    fs.delete(manifest, false)
    dropped
  }

  /** Finish or undo an interrupted [[purgeKeys]] swap: roll FORWARD
    * when every manifest-listed new file landed (delete leftover old
    * files), roll BACK otherwise (drop any half-moved new files — the
    * old files are still present because deletion only starts after
    * all adds). */
  private def recoverPurge(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val manifest = new Path(path, "._purge_manifest")
    if (!fs.exists(manifest)) {
      fs.delete(new Path(path, "._purge_tmp"), true)
      return
    }
    val lines = readText(fs, manifest).split("\n").filter(_.nonEmpty)
    val dels = lines.filter(_.startsWith("D ")).map(_.drop(2))
    val adds = lines.filter(_.startsWith("A ")).map(_.drop(2))
    val allAdded = adds.forall(n => fs.exists(new Path(path, s"purge-$n")))
    if (allAdded) // roll forward: finish deleting the old files
      dels.foreach(n => fs.delete(new Path(path, n), false))
    else { // roll back: old files are intact, drop partial adds
      adds.foreach(n => fs.delete(new Path(path, s"purge-$n"), false))
    }
    fs.delete(new Path(path, "._purge_tmp"), true)
    fs.delete(manifest, false)
  }

  private def writeText(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readText(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** S9 — timestamped output layout
    * `<out>/<ts>_parsedData|_featureData|_models|_predictions`
    * (reference JobRunner.scala:31,59-61,70-71). */
  final case class OutputLayout(base: String, timestamp: String) {
    def parsedData: String = s"$base/${timestamp}_parsedData"
    def featureData: String = s"$base/${timestamp}_featureData"
    def models: String = s"$base/${timestamp}_models"
    def predictions: String = s"$base/${timestamp}_predictions"
  }

  def layout(base: String): OutputLayout = {
    new java.io.File(base).mkdirs()
    OutputLayout(base,
      new SimpleDateFormat("yyyy-MM-dd-HHmmss").format(new Date()))
  }
}
