package graft

import java.sql.Timestamp
import graft.operators.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at or before left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)) // no prior right row
      .toDF("user_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10L),
      (1L, ts("2024-01-01 10:00:00"), 11L), // simultaneous with 100
      (1L, ts("2024-01-01 11:00:00"), 12L),
      (2L, ts("2024-01-01 09:30:00"), 20L)) // after left's only row
      .toDF("user_id", "ts", "event_id")
    val got = AsOf.asOfJoin(left, right, "user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      100L -> 11L, // simultaneous right row matches (ties: right first)
      101L -> 12L)) // latest right before 12:00
    // user 2's left row has no right row at-or-before it → dropped
  }

  test("q40 matches are prior-or-simultaneous clicks of the same user") {
    val r = AsOf.q40(tables.events)
    assert(r.count() > 0)
    val joined = r
      .join(tables.events.select(col("event_id").as("p_event"),
        col("ts").as("p_ts"), col("user_id").as("p_user")), "p_event")
      .join(tables.events.select(col("event_id").as("click_event"),
        col("ts").as("c_ts"), col("user_id").as("c_user"),
        col("event_type").as("c_type")), "click_event")
    assert(joined.filter(col("p_user") =!= col("c_user")).count() == 0)
    assert(joined.filter(col("c_type") =!= "click").count() == 0)
    assert(joined.filter(col("c_ts") > col("p_ts")).count() == 0)
  }

  test("pitJoin: left semantics, per-feature as-of values, tie rules") {
    val spine = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L)) // before any feature row
      .toDF("user_id", "ts", "event_id")
    val fa = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10L, 1.5),
      // two rows at the SAME ts: highest event_id (12) must win
      (1L, ts("2024-01-01 10:00:00"), 11L, 2.5),
      (1L, ts("2024-01-01 10:00:00"), 12L, 3.5),
      (2L, ts("2024-01-01 09:30:00"), 20L, 9.0)) // after user 2's spine
      .toDF("user_id", "ts", "event_id", "value")
    val fb = Seq(
      (1L, ts("2024-01-01 11:00:00"), 30L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = AsOf.pitJoin(spine, Seq("a" -> fa, "b" -> fb),
        "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(2) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet == Set(100L, 101L, 200L), "spine must survive whole")
    assert(got(100L) == (Some(3.5), None)) // same-ts tie -> id 12's value
    assert(got(101L) == (Some(3.5), Some(7.0)))
    assert(got(200L) == (None, None)) // nothing before -> all null
  }

  test("pitJoin returns a latest row's NULL value as NULL (not an older value)") {
    val spine = Seq((1L, ts("2024-01-01 12:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val fa = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, Some(1.5)),
      // latest at-or-before row has a genuinely NULL value — the
      // contract ("value of the latest row") requires NULL out, not 1.5
      (1L, ts("2024-01-01 11:00:00"), 11L, None))
      .toDF("user_id", "ts", "event_id", "value")
    val got = AsOf.pitJoin(spine, Seq("a" -> fa),
        "user_id", "ts", "event_id", "value")
      .collect()
    assert(got.length == 1)
    assert(got.head.isNullAt(3),
      "latest row's NULL value must surface as NULL, not the older 1.5")
  }

  test("q146 columns are leakage-free: no feature value from the future") {
    val r = AsOf.q146(tables.events)
    assert(r.count() > 0)
    // every non-null feature must equal the value of SOME event of that
    // type by the same user at-or-before the purchase ts
    val p = tables.events.select(col("event_id").as("p_event"),
      col("ts").as("p_ts"))
    for ((c, t) <- Seq(("last_click_v", "click"), ("last_error_v", "error"),
        ("last_view_v", "view"))) {
      val bad = r.filter(col(c).isNotNull).join(p, "p_event")
        .join(tables.events.filter(col("event_type") === t)
            .select(col("user_id"), col("ts").as("f_ts"),
              col("value").as("f_v")),
          Seq("user_id"), "left")
        .filter(col("f_ts") <= col("p_ts") && col("f_v") === col(c))
        .groupBy("p_event").count()
      val withMatch = bad.count()
      val claimed = r.filter(col(c).isNotNull).count()
      assert(withMatch == claimed,
        s"$c: $claimed non-null features but only $withMatch provably " +
          "from a past event")
    }
  }
}
