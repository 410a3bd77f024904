package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operator — the pipeline health check every
  * training-data ingest needs before anything downstream trusts the
  * table: per-column null counts, exact distinct counts, and
  * numeric/length ranges, computed in ONE aggregate pass and emitted
  * LONG-FORM `(col_name, metric, value)` so the output schema is fixed
  * regardless of which table or columns are profiled.
  *
  * Scale shape: a single groupBy-less aggregate — every metric is a
  * partial-aggregatable expression, so the scan streams once and only
  * |cols|·|metrics| doubles reach the driver side of the plan. The
  * distinct counts use the Expand-based exact form (declared-oracle
  * parity); swap to `approx_count_distinct` at 100 TB where ±2% is
  * acceptable.
  */
object Profile {

  /** Numeric-column metrics: nulls, distinct, min, max, avg. */
  private def numericMetrics(c: String): Seq[(String, Column)] = Seq(
    "nulls" -> sum(when(col(c).isNull, 1).otherwise(0)).cast("double"),
    "distinct" -> countDistinct(col(c)).cast("double"),
    "min" -> round(min(col(c)).cast("double"), 4),
    "max" -> round(max(col(c)).cast("double"), 4),
    "avg" -> round(avg(col(c).cast("double")), 4))

  /** String-column metrics: nulls, distinct, length range/mean. */
  private def stringMetrics(c: String): Seq[(String, Column)] = Seq(
    "nulls" -> sum(when(col(c).isNull, 1).otherwise(0)).cast("double"),
    "distinct" -> countDistinct(col(c)).cast("double"),
    "min_len" -> min(length(col(c))).cast("double"),
    "max_len" -> max(length(col(c))).cast("double"),
    "avg_len" -> round(avg(length(col(c)).cast("double")), 4))

  /** Profile `numericCols` and `stringCols` of `df` → one row per
    * (column, metric), totally ordered. */
  def profile(
      df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val metrics: Seq[(String, String, Column)] =
      numericCols.flatMap(c => numericMetrics(c).map { case (m, e) =>
        (c, m, e) }) ++
        stringCols.flatMap(c => stringMetrics(c).map { case (m, e) =>
          (c, m, e) })
    val aggs = metrics.map { case (c, m, e) => e.as(s"${c}__$m") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = metrics.map { case (c, m, _) =>
      struct(lit(c).as("col_name"), lit(m).as("metric"),
        col(s"${c}__$m").as("value"))
    }
    one.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.metric"), col("e.value"))
      .orderBy("col_name", "metric")
  }

  /** q55 — lineitem profile (3 numeric + 2 string columns). */
  def q55(t: graft.Tables): DataFrame =
    profile(t.lineitem,
      Seq("l_quantity", "l_extendedprice", "l_discount"),
      Seq("l_returnflag", "l_linestatus"))

  /** DuckDB oracle for [[q55]] — the same metrics as UNION ALL scans
    * (the oracle favors obviousness over elegance). */
  def q55OracleSql: String = {
    def num(c: String) = Seq(
      s"SELECT '$c' AS col_name, 'nulls' AS metric, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM lineitem",
      s"SELECT '$c', 'distinct', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM lineitem",
      s"SELECT '$c', 'min', ROUND(CAST(MIN($c) AS DOUBLE), 4) FROM lineitem",
      s"SELECT '$c', 'max', ROUND(CAST(MAX($c) AS DOUBLE), 4) FROM lineitem",
      s"SELECT '$c', 'avg', ROUND(AVG(CAST($c AS DOUBLE)), 4) FROM lineitem")
    def str(c: String) = Seq(
      s"SELECT '$c' AS col_name, 'nulls' AS metric, CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS value FROM lineitem",
      s"SELECT '$c', 'distinct', CAST(COUNT(DISTINCT $c) AS DOUBLE) FROM lineitem",
      s"SELECT '$c', 'min_len', CAST(MIN(LENGTH($c)) AS DOUBLE) FROM lineitem",
      s"SELECT '$c', 'max_len', CAST(MAX(LENGTH($c)) AS DOUBLE) FROM lineitem",
      s"SELECT '$c', 'avg_len', ROUND(AVG(CAST(LENGTH($c) AS DOUBLE)), 4) FROM lineitem")
    val parts =
      Seq("l_quantity", "l_extendedprice", "l_discount").flatMap(num) ++
        Seq("l_returnflag", "l_linestatus").flatMap(str)
    parts.mkString("SELECT * FROM (\n", "\nUNION ALL ",
      "\n) ORDER BY col_name, metric")
  }
}
