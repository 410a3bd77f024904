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
}
