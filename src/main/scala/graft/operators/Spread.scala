package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-split underflow guard shared by the explode/hash-heavy
  * operators: per-row work immediately after a scan inherits the scan's
  * split count, and a single-row-group parquet file (the local
  * testdata; gzip'd text dumps in the wild) yields ONE split and
  * serializes everything. When splits < cores, one bounded shuffle of
  * the raw rows buys full-core fan-out; at warehouse scale
  * (splits ≫ cores) this is a no-op — no repartition reaches the plan.
  */
private[operators] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
