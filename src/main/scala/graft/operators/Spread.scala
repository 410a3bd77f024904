package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Input-split underflow guard shared by the explode/hash-heavy
  * operators: per-row work immediately after a scan inherits the scan's
  * split count, and a single-row-group parquet file (the local
  * testdata; gzip'd text dumps in the wild) yields ONE split and
  * serializes everything. When the scan is smaller than cores×split
  * size, one bounded shuffle of the raw rows buys full-core fan-out; at
  * warehouse scale (bytes ≫ cores×split) this is a no-op — no
  * repartition reaches the plan.
  *
  * The split count is ESTIMATED from the optimized plan's size
  * statistics (`stats.sizeInBytes / files.maxPartitionBytes`) — no
  * physical planning and no `df.rdd` materialization on the driver, so
  * the guard costs an analysis pass only and AQE still sees the
  * original plan. Non-file sources report huge default sizes and fall
  * through untouched.
  */
private[operators] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val maxSplit = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val estSplits = (bytes / maxSplit).min(Int.MaxValue).toInt + 1
    if (estSplits < p) df.repartition(p) else df
  }
}
