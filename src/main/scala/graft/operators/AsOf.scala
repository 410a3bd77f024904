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

  /** q146 — point-in-time (PIT) multi-feature as-of join, the feature-
    * store primitive: every spine row gets, for EACH feature table,
    * the value of that table's latest row at or before the spine
    * timestamp — or null when none exists yet (LEFT semantics: the
    * spine survives whole, which is what makes the result leakage-free
    * training data — no feature from the future, no dropped examples).
    *
    * Spark-first: all feature tables and the spine union into ONE
    * frame; each feature becomes one `last(_, ignoreNulls)` column
    * over the SAME (key, ts, side, id) window, so Spark evaluates all
    * of them in a single WindowExec — one shuffle on the key and one
    * in-partition sort TOTAL, regardless of how many feature tables
    * join. The per-(key, ts) pre-collapse (highest id wins) makes
    * timestamp ties deterministic on both engines. The DuckDB oracle
    * is deliberately NOT this algorithm: it chains native ASOF LEFT
    * JOINs — an independent implementation agreeing on every row.
    *
    * Scale: partitioned window state is O(1) per feature (running
    * last), the union is linear, and a spine of 10⁹ purchases against
    * k feature tables still pays one shuffle — vs k shuffles for k
    * chained as-of joins. */
  def pitJoin(
      spine: DataFrame, features: Seq[(String, DataFrame)],
      key: String, tsCol: String, idCol: String, valueCol: String)
      : DataFrame = {
    require(features.nonEmpty, "pitJoin needs at least one feature table")
    val names = features.map(_._1)
    require(names.distinct == names, "feature names must be unique")
    val collapsed = features.map { case (name, df) =>
      val w = Window.partitionBy(key, tsCol).orderBy(col(idCol).desc)
      name -> df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col(key), col(tsCol), col(idCol), col(valueCol))
    }
    // Presence is carried explicitly as a one-field struct: a feature
    // row ALWAYS contributes a non-null struct (even when its value is
    // genuinely NULL), while rows of other tables contribute a null
    // struct. last(struct, ignoreNulls) therefore lands on the latest
    // at-or-before ROW and returns that row's value as-is — a latest
    // NULL value surfaces as NULL instead of being skipped for an
    // older value (matches the DuckDB ASOF oracle).
    val nullCell = lit(null).cast("struct<v:double>")
    val spineSide = spine.select(
      Seq(col(key), col(tsCol), col(idCol).as("__sid"),
        lit(1).as("__side")) ++
        names.map(n => nullCell.as(s"__v_$n")): _*)
    val unioned = collapsed.foldLeft(spineSide) { case (acc, (name, df)) =>
      acc.unionByName(df.select(
        Seq(col(key), col(tsCol), col(idCol).as("__sid"),
          lit(0).as("__side")) ++
          names.map(n => (if (n == name)
              struct(col(valueCol).cast("double").as("v"))
            else nullCell).as(s"__v_$n")): _*))
    }
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__side"), col("__sid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    names.foldLeft(unioned) { (df, n) =>
        df.withColumn(n,
          last(col(s"__v_$n"), ignoreNulls = true).over(w).getField("v"))
      }
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(tsCol), col("__sid").as(idCol)) ++
        names.map(col): _*)
  }

  /** q146 gate: purchases as the spine; the user's latest click,
    * error, and view values as three feature tables. */
  def q146(events: DataFrame): DataFrame = {
    def side(t: String) = events.filter(col("event_type") === t)
    pitJoin(
      side("purchase"),
      Seq("last_click_v" -> side("click"), "last_error_v" -> side("error"),
        "last_view_v" -> side("view")),
      key = "user_id", tsCol = "ts", idCol = "event_id",
      valueCol = "value")
      .select(col("user_id"), col("event_id").as("p_event"),
        col("last_click_v"), col("last_error_v"), col("last_view_v"))
      .orderBy("p_event")
  }
}
