package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Catalog/warehouse parity for S4: the reference's warehouse source is
  * a Hive-partitioned table read with year/month/day pruning predicates
  * (DataGatherer.scala:68-74, `wmf.pageview_hourly WHERE year=2017 and
  * month=1 and day=1`). This module expresses the same shape on Spark's
  * built-in catalog:
  *
  *  - every testdata parquet registered as an external catalog table in
  *    database `graft` (so `spark.sql` users address tables by name, not
  *    path, and the catalog carries the schema);
  *  - a warehouse-style `events_hourly` table physically partitioned by
  *    (year, month, day), partition-recovered into the catalog, where
  *    year/month/day predicates prune at the FILE level
  *    (`PruneFileSourcePartitions` — the scan never opens non-matching
  *    directories, the property that makes a 100 TB warehouse readable).
  *
  * At scale these registrations are a real metastore's DDL; the query
  * shapes are identical.
  */
object Warehouse {

  val Db = "graft"

  /** Register every testdata parquet as an external catalog table.
    * Idempotent for a given sf dir — and safe across dirs: if a table
    * of the same name is already registered but points at a DIFFERENT
    * location (an earlier call with another sf dir in the same JVM),
    * it is dropped and re-created rather than silently serving the old
    * dir's data. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    Tables.names.foreach { n =>
      val want = Tables.path(dir, n)
      if (spark.catalog.tableExists(s"$Db.$n") &&
          registeredLocation(spark, s"$Db.$n").exists(
            loc => !samePath(loc, want))) {
        spark.sql(s"DROP TABLE $Db.$n")
      }
      spark.sql(s"CREATE TABLE IF NOT EXISTS $Db.$n USING parquet " +
        s"LOCATION '$want'")
    }
  }

  /** Current LOCATION of a registered table (external catalog URI). */
  private def registeredLocation(
      spark: SparkSession, table: String): Option[String] =
    spark.sql(s"DESCRIBE FORMATTED $table")
      .collect()
      .find(_.getString(0) == "Location")
      .map(_.getString(1))

  /** Compare a catalog location URI against a requested path, tolerant
    * of `file:` scheme prefixes and trailing slashes. */
  private def samePath(a: String, b: String): Boolean = {
    def norm(s: String) =
      s.stripPrefix("file:").replaceAll("/+$", "")
    norm(a) == norm(b)
  }

  /** Deterministic location for the partitioned copy, keyed on the
    * sf-dir path AND a content fingerprint (size + mtime of every file
    * under the source events parquet). Regenerating the testdata in
    * place changes the fingerprint → a fresh root → a rebuild, instead
    * of silently serving the stale partitioned copy. */
  private def hourlyRoot(dir: String): java.io.File = {
    val src = new java.io.File(
      Tables.path(dir, "events").stripPrefix("file:"))
    val files =
      if (src.isDirectory) Option(src.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
      else Array(src)
    val sig = dir + files
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|", "|", "")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_$key",
      "events_hourly")
  }

  /** Ensure the partitioned warehouse-style events table exists and is
    * registered; returns its qualified name. The physical layout is one
    * directory per (year, month, day) — the reference warehouse's
    * pageview_hourly shape — so pruning predicates skip whole
    * directories before any footer is read. Build is idempotent and
    * happens once per sf dir per machine. */
  def ensureEventsHourly(spark: SparkSession, dir: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $Db")
    val root = hourlyRoot(dir)
    if (!new java.io.File(root, "_SUCCESS").exists()) {
      Tables.load(spark, dir, "events")
        .withColumn("year", year(col("ts")))
        .withColumn("month", month(col("ts")))
        .withColumn("day", dayofmonth(col("ts")))
        .write.mode("overwrite")
        .partitionBy("year", "month", "day")
        .parquet(root.toString)
    }
    val table = s"$Db.events_hourly"
    // re-point if a previous registration targets another root (other
    // sf dir, or source regenerated → new fingerprinted root)
    if (spark.catalog.tableExists(table) &&
        registeredLocation(spark, table).exists(
          loc => !samePath(loc, root.toString))) {
      spark.sql(s"DROP TABLE $table")
    }
    if (!spark.catalog.tableExists(table)) {
      spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$root'")
      spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
    }
    table
  }
}
