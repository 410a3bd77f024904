package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — match each left row to the most recent right row at or
  * before its timestamp, per key. The reference has no such operator
  * (SURVEY §2.3 "no as-of"); it is declared engine surface because
  * event-stream feature extraction constantly needs it ("state as of
  * the event").
  *
  * Spark-first composition (preference order (a) of the build rules —
  * no custom SparkPlan needed): tag both sides, union, and carry the
  * last right-side payload forward with an ignore-nulls window. One
  * shuffle on the key, in-partition sort, linear scan — the same cost
  * profile as a dedicated as-of physical operator, and AQE/skew
  * handling apply since it is all Catalyst.
  *
  * Tie semantics: a right row with the SAME timestamp as a left row
  * matches (right sorts before left at equal ts); ties within a side
  * break by `idCol` — fully deterministic and mirrored in the q40
  * oracle.
  */
object AsOf {

  /** Generic form: rows of `left` matched to the latest `right` row
    * with right.ts <= left.ts on `key`; unmatched left rows drop
    * (inner as-of). Both inputs need (`key`, `tsCol`, `idCol`);
    * the match emits the right row's id as `matchCol`. */
  def asOfJoin(
      left: DataFrame, right: DataFrame, key: String, tsCol: String,
      idCol: String, matchCol: String = "matched_id"): DataFrame = {
    val l = left.select(col(key), col(tsCol), col(idCol))
      .withColumn("_side", lit(1))
      .withColumn("_payload", lit(null).cast("long"))
    val r = right.select(col(key), col(tsCol), col(idCol))
      .withColumn("_side", lit(0))
      .withColumn("_payload", col(idCol).cast("long"))
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("_side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    l.unionByName(r)
      .withColumn(matchCol, last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col(matchCol).isNotNull)
      .select(col(key), col(idCol), col(matchCol))
  }

  /** q40 — events flavor: each purchase matched to the user's most
    * recent prior (or simultaneous) click. */
  def q40(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type").isin("click", "purchase"))
    asOfJoin(
      base.filter(col("event_type") === "purchase"),
      base.filter(col("event_type") === "click"),
      key = "user_id", tsCol = "ts", idCol = "event_id",
      matchCol = "click_event")
      .select(col("user_id"), col("event_id").as("p_event"),
        col("click_event"))
      .orderBy("p_event")
  }
}
