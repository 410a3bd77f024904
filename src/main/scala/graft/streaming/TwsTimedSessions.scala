package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Event-time TIMERS on `transformWithState` — the append-mode session
  * shape [[TwsSessions]] cannot express: instead of re-emitting a
  * key's cumulative counts every micro-batch (update mode), a closed
  * session is emitted EXACTLY ONCE — either when a later event proves
  * the gap elapsed, or when the WATERMARK passes `lastTs + gap` and
  * the registered timer fires for an idle key. That timer is what lets
  * a 10⁹-key store drain itself: idle keys emit and clear without
  * waiting for (possibly never-arriving) further input.
  *
  * State per key: one open-session triple + one registered timer,
  * re-armed on every batch that touches the key. O(1) per key.
  */
object TwsTimedSessions {

  import StatefulSessions.Event

  final case class SessionOut(
      user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** Closes sessions by in-batch gap or by event-time timer. */
  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    private def ts(ms: Long) = new Timestamp(ms)

    override def handleInputRows(
        key: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq
        .map(e => StatefulSessions.micros(e.ts) / 1000L).sorted
      var out = List.empty[SessionOut]
      var st: OpenSession = if (open.exists()) open.get() else null
      sorted.foreach { t =>
        st match {
          case null => st = OpenSession(t, t, 1L)
          case s if t - s.lastMs >= gapMs =>
            out ::= SessionOut(key, ts(s.startMs), ts(s.lastMs), s.n)
            st = OpenSession(t, t, 1L)
          case s =>
            st = OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1)
        }
      }
      open.update(st)
      // one armed timer per key: re-arm at the new close deadline
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(st.lastMs + gapMs)
      out.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(SessionOut(key, ts(s.startMs), ts(s.lastMs), s.n))
      } else Iterator.empty
  }

  /** Streaming sessionization with once-per-session append output.
    * `delay` is the watermark lateness bound; timers fire when the
    * watermark passes a key's close deadline. */
  def sessionize(
      spark: SparkSession, events: Dataset[_],
      gapMs: Long = StatefulSessions.GapMicros / 1000L,
      delay: String = "0 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    events.toDF()
      .select(col("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(
        new Processor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
