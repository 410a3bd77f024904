package graft.operators

import graft.functions.ZOrderFunctions.interleave_bits16
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the layout-side optimization that makes selective scans
  * cheap at 100 TB: sort the table along an interleaved-bit curve of
  * two filter columns before writing parquet, and a range predicate
  * on EITHER column confines its matches to few row groups, so the
  * reader's min/max stats prune the rest without opening them. A
  * single-column sort gives perfect pruning on that column and NONE
  * on the other; the Z-curve splits the difference (the public Delta
  * Lake OPTIMIZE ZORDER design).
  *
  * The interleave itself is a native codegen'd expression
  * ([[graft.functions.InterleaveBits16]]); writing is one
  * `repartitionByRange(zvalue)` + in-partition sort — exactly the
  * shuffle a plain sorted write already pays, so Z-ordering is
  * cost-neutral at write time.
  */
object ZOrder {

  /** Scale `c` from [lo, hi] into the 16-bit grid [0, 65535], clamped
    * at both ends (out-of-range values land on the edge cells — they
    * degrade pruning for their row group, never correctness; parquet
    * stats are derived from the DATA, the z-key is only a sort key).
    * `lo`/`hi` come from table stats or domain knowledge; they need
    * to be roughly right, not exact. */
  def scaleTo16(c: Column, lo: Double, hi: Double): Column = {
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val scaled = ((c.cast("double") - lit(lo)) * 65535.0 /
      (lit(hi) - lit(lo)))
    greatest(lit(0L), least(lit(65535L),
      floor(scaled).cast("long")))
  }

  /** Morton code of two pre-scaled 16-bit columns. */
  def zValue(x16: Column, y16: Column): Column =
    interleave_bits16(x16.cast("long"), y16.cast("long"))

  /** Cluster `df` along the Z-curve of two scaled dimensions into
    * `numFiles` range partitions, each internally sorted — written to
    * parquet, every output file covers a compact Z-range, so both
    * dimensions' min/max stats are tight. */
  def zorderBy(
      df: DataFrame, x16: Column, y16: Column,
      numFiles: Int): DataFrame = {
    val keyed = df.withColumn("__z", zValue(x16, y16))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** q160 — Z-order layout audit over lineitem on (l_partkey,
    * l_suppkey): bucket rows by the top bits of the Morton code and
    * report per-bucket extents of BOTH dimensions. The hash gate
    * proves the interleave math bit-for-bit against the oracle's
    * arithmetic construction; the per-bucket min/max columns ARE the
    * row-group stats a z-ordered write would produce — tight on both
    * dimensions at once (ZOrderSpec proves the pruning consequence on
    * real parquet footers). */
  def q160(t: graft.Tables): DataFrame =
    t.lineitem
      .select(
        col("l_partkey"), col("l_suppkey"),
        zValue(col("l_partkey") % 65536, col("l_suppkey") % 65536)
          .as("z"))
      .withColumn("bucket", shiftright(col("z"), 16).cast("long"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        min("l_partkey").as("min_pk"), max("l_partkey").as("max_pk"),
        min("l_suppkey").as("min_sk"), max("l_suppkey").as("max_sk"),
        min("z").as("min_z"), max("z").as("max_z"))
      .orderBy("bucket")
}
