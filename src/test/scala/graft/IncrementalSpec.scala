package graft

import graft.sources.Incremental
import org.apache.spark.sql.functions._

/** Incremental partition processing over the warehouse-style
  * (year, month, day)-partitioned catalog table. */
class IncrementalSpec extends SparkSpec {

  private def dailyCounts(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("year", "month", "day")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))

  test("first run processes all partitions, second run none; a late " +
    "partition is picked up alone") {
    // test-local partitioned table: the shared Warehouse copy must not
    // grow synthetic partitions (q31/IoSpec read it)
    val base = java.nio.file.Files.createTempDirectory("graft-inc").toString
    val state = s"$base/state"; val out = s"$base/out"
    val root = s"$base/table"
    tables.events
      .withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
      .write.partitionBy("year", "month", "day").parquet(root)
    val table = "graft_inc_test"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"CREATE TABLE $table USING parquet LOCATION '$root'")
    spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")

    val all = Incremental.partitions(spark, table)
    assert(all.nonEmpty)

    val first = Incremental.processNew(spark, table, state, out)(dailyCounts)
    assert(first == all, "first run must process every partition")
    val afterFirst = spark.read.parquet(out)
    assert(afterFirst.count() == all.size.toLong,
      "one daily-count row per partition")

    val second = Incremental.processNew(spark, table, state, out)(dailyCounts)
    assert(second.isEmpty, "no new partitions -> nothing processed")
    assert(spark.read.parquet(out).count() == all.size.toLong,
      "idempotent: output unchanged")

    // a late-arriving partition lands in the table root; after catalog
    // recovery only IT gets processed.
    // partition values live in the PATH, not the data files
    tables.events.limit(7)
      .write.mode("overwrite")
      .parquet(s"$root/year=2099/month=1/day=1")
    spark.sql(s"ALTER TABLE $table RECOVER PARTITIONS")
    val third0 = Incremental.processNew(spark, table, state, out)(dailyCounts)
    assert(third0 == Seq("year=2099/month=1/day=1"),
      s"only the late partition, got $third0")
    val row = spark.read.parquet(out)
      .filter(col("year") === 2099).collect()
    assert(row.length == 1 && row(0).getAs[Long]("n") == 7L)
  }
}
