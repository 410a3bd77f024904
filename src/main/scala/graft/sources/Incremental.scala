package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental batch processing over a partitioned catalog table: each
  * run processes ONLY partitions that no previous run has seen, the
  * pattern that turns a 100 TB warehouse job into a per-interval one.
  *
  *  - Partition inventory comes from the catalog (`SHOW PARTITIONS`) —
  *    no directory listing of the data itself.
  *  - Processed partitions are recorded in a plain-text ledger, one
  *    spec per line, updated atomically (tmp + rename) AFTER the
  *    output commit — a crash between commit and ledger update replays
  *    one interval into an idempotent sink rather than losing one.
  *  - All new partitions are processed in ONE job: the OR-of-specs
  *    predicate is a partition-column filter, so
  *    PruneFileSourcePartitions reduces the scan to exactly the new
  *    directories (file-level pruning, same mechanism IoSpec asserts
  *    for the warehouse table).
  *
  * The reference's warehouse job hard-codes one (year, month, day)
  * per run (DataGatherer.scala:68-74); this generalizes it to "every
  * interval not yet processed", which is what its daily cron was
  * approximating.
  */
object Incremental {

  /** Current partition specs of a catalog table, as the catalog's
    * canonical `k1=v1/k2=v2` strings. */
  def partitions(spark: SparkSession, table: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS $table")
      .collect().map(_.getString(0)).toSeq.sorted

  private def ledgerFile(statePath: String) =
    new java.io.File(statePath, "processed_partitions.txt")

  /** Partition specs already recorded in the ledger. */
  def processed(statePath: String): Set[String] = {
    val f = ledgerFile(statePath)
    if (!f.exists()) Set.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    }
  }

  /** Spec string `k1=v1/k2=v2` → SQL predicate `k1='v1' AND k2='v2'`
    * (partition values are strings in the catalog; comparisons against
    * string literals still prune — Spark casts the literal). */
  private def specPredicate(spec: String): String =
    spec.split('/').map { kv =>
      val Array(k, v) = kv.split("=", 2)
      s"$k='$v'"
    }.mkString(" AND ")

  /** Run `transform` over every not-yet-processed partition of
    * `table`, append the result to `outDir` (parquet), record the
    * partitions in the ledger, and return the specs processed this
    * run. No new partitions → no job at all. */
  def processNew(
      spark: SparkSession, table: String, statePath: String,
      outDir: String)(transform: DataFrame => DataFrame): Seq[String] = {
    val done = processed(statePath)
    val fresh = partitions(spark, table).filterNot(done)
    if (fresh.nonEmpty) {
      val pred = fresh.map(s => s"(${specPredicate(s)})").mkString(" OR ")
      val slice = spark.table(table).where(pred)
      transform(slice).write.mode("append").parquet(outDir)
      // ledger update AFTER the commit, atomically
      new java.io.File(statePath).mkdirs()
      val tmp = new java.io.File(statePath, ".ledger_tmp")
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      try (done ++ fresh).toSeq.sorted.foreach(w.println) finally w.close()
      val moved = tmp.renameTo(ledgerFile(statePath))
      require(moved, s"ledger rename failed under $statePath")
    }
    fresh
  }
}
