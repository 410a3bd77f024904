package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY
  * §2.9's "custom state" surface): the hand-rolled analogue of
  * `session_window`, demonstrating arbitrary per-key state for the
  * session shapes the built-in window cannot express (e.g. emitting
  * per-session event counts with custom close conditions).
  *
  * State per user is one (sessionCount, runningEvents, lastTs) triple —
  * O(1) per key regardless of event volume; the watermark bounds how
  * long idle keys stay in the store.
  */
object StatefulSessions {

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessState(sessions: Long, events: Long, lastTs: Long)
  final case class UserSessions(user_id: Long, sessions: Long, events: Long)

  val GapMicros: Long = 30L * 60 * 1000 * 1000

  private[streaming] def micros(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos / 1000) % 1000

  /** Batch-mode state function: events arrive unordered, so sort within
    * the group (batch groups are complete; in streaming the sort is per
    * micro-batch and the state carries across batches). */
  def updateState(
      userId: Long, rows: Iterator[Event],
      state: GroupState[SessState]): Iterator[UserSessions] = {
    val sorted = rows.toSeq.sortBy(e => micros(e.ts))
    var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
    sorted.foreach { e =>
      val t = micros(e.ts)
      val newSession = st.sessions == 0L || t - st.lastTs >= GapMicros
      st = SessState(
        st.sessions + (if (newSession) 1 else 0), st.events + 1, t)
    }
    state.update(st)
    Iterator.single(UserSessions(userId, st.sessions, st.events))
  }

  /** Sessionize a (user_id, ts) dataset — works on batch Datasets
    * (state evaluated once per group) and streaming ones (state carried
    * across micro-batches). */
  def sessionize(spark: SparkSession, events: Dataset[_]): Dataset[UserSessions] = {
    import spark.implicits._
    events.toDF()
      .select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(updateState)
  }
}
