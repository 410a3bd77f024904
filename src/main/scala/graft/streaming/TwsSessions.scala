package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues,
  ValueState}

/** `transformWithState` port of [[StatefulSessions]] — the Spark 4
  * arbitrary-state API (SURVEY §2.9) a new streaming user reaches for
  * first. Same session semantics and the same O(1)-per-key
  * (sessions, events, lastTs) state triple, expressed as a
  * [[StatefulProcessor]] with a named [[ValueState]] handle instead of
  * a `GroupState` closure. The typed-handle model is what scales the
  * API: state lives in the (RocksDB-backed) store under a stable name,
  * supports per-state TTL, and admits multiple independent state
  * variables per key without packing them into one case class.
  *
  * Asserted equal to both the `session_window` aggregate and the
  * `flatMapGroupsWithState` formulation in StreamingSpec, batch AND
  * micro-batch (RocksDB provider) paths.
  */
object TwsSessions {

  import StatefulSessions.{Event, SessState, UserSessions}

  /** Per-key session counter. State: one [[SessState]] value named
    * "sess" (no TTL — the test corpus is bounded; production would set
    * a TTL of the session gap plus late-data slack). */
  class SessionProcessor
      extends StatefulProcessor[Long, Event, UserSessions] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState](
        "sess", Encoders.product[SessState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserSessions] = {
      // events arrive unordered within a micro-batch: sort locally
      // (bounded by the batch's per-key volume, never global)
      val sorted = rows.toSeq.sortBy(e => StatefulSessions.micros(e.ts))
      var st =
        if (state.exists()) state.get()
        else SessState(0L, 0L, Long.MinValue)
      sorted.foreach { e =>
        val t = StatefulSessions.micros(e.ts)
        val newSession =
          st.sessions == 0L || t - st.lastTs >= StatefulSessions.GapMicros
        st = SessState(
          st.sessions + (if (newSession) 1 else 0), st.events + 1, t)
      }
      state.update(st)
      Iterator.single(UserSessions(key, st.sessions, st.events))
    }
  }

  /** Sessionize a (user_id, ts) dataset — batch Datasets (state
    * evaluated once per group) and streaming ones (state carried
    * across micro-batches in the state store). */
  def sessionize(
      spark: SparkSession, events: Dataset[_]): Dataset[UserSessions] = {
    import spark.implicits._
    events.toDF()
      .select(col("user_id"), col("ts"))
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionProcessor, TimeMode.None(), OutputMode.Update())
  }
}
