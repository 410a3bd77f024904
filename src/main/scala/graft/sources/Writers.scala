package graft.sources

import java.text.SimpleDateFormat
import java.util.Date
import org.apache.spark.sql.{DataFrame, SaveMode}

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
