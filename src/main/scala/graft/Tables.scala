package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver-generated parquet testdata
  * (`TESTDATA.md`): loads each table from `<dir>/<name>.parquet` and
  * registers a same-named temp view so both the DataFrame operator
  * surface and `spark.sql` can reach it.
  *
  * Scale posture: loads are plain parquet scans — Catalyst handles
  * column pruning + predicate pushdown; nothing is cached or
  * collected here. At 100 TB these would be partitioned tables /
  * catalog entries; the accessor shape stays identical.
  */
final case class Tables(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame)

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

  /** Load all tables and register temp views named after them. */
  def apply(spark: SparkSession, dir: String): Tables = {
    val m = names.map { n =>
      val df = load(spark, dir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
    Tables(
      m("region"), m("nation"), m("customer"), m("supplier"), m("part"),
      m("orders"), m("lineitem"), m("events"), m("documents"),
      m("embeddings"))
  }
}
