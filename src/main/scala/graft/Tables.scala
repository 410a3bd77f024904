package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet testdata
  * (`TESTDATA.md`): lazy accessors per table, so a query pays the
  * parquet-footer/schema read only for the tables it actually touches.
  *
  * Scale posture: loads are plain parquet scans — Catalyst handles
  * column pruning + predicate pushdown; nothing is cached or collected
  * here. At 100 TB these would be partitioned tables / catalog
  * entries; the accessor shape stays identical.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  lazy val region: DataFrame = Tables.load(spark, dir, "region")
  lazy val nation: DataFrame = Tables.load(spark, dir, "nation")
  lazy val customer: DataFrame = Tables.load(spark, dir, "customer")
  lazy val supplier: DataFrame = Tables.load(spark, dir, "supplier")
  lazy val part: DataFrame = Tables.load(spark, dir, "part")
  lazy val orders: DataFrame = Tables.load(spark, dir, "orders")
  lazy val lineitem: DataFrame = Tables.load(spark, dir, "lineitem")
  lazy val events: DataFrame = Tables.load(spark, dir, "events")
  lazy val documents: DataFrame = Tables.load(spark, dir, "documents")
  lazy val embeddings: DataFrame = Tables.load(spark, dir, "embeddings")

  /** Register every table as a same-named temp view (for `spark.sql`
    * users; forces all schema reads). */
  def registerViews(): Tables = {
    Tables.names.foreach(n =>
      Tables.load(spark, dir, n).createOrReplaceTempView(n))
    this
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = {
    val d = if (dir.endsWith("/")) dir.dropRight(1) else dir
    s"$d/$name.parquet"
  }

  /** Load one table (no view registration).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; we read nanos as long (legacy conf) and truncate to
    * µs with integer division (`div`, not `/`: a double round-trip would
    * lose precision on ~1.7e18 nanosecond epochs). DuckDB keeps ns — the
    * declared oracle queries never emit sub-second values, so the two
    * engines agree.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(path(dir, name))
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  def apply(spark: SparkSession, dir: String): Tables =
    new Tables(spark, dir)
}
