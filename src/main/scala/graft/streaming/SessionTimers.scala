package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Event-time session finalization with `transformWithState` TIMERS —
  * the piece of the arbitrary-state API [[TtlState]] doesn't cover.
  *
  * Each user's open session accumulates in a ValueState; every batch the
  * processor re-registers ONE timer at `session_end + gap` in event time.
  * When the watermark passes that point the session can never reopen
  * (late events beyond the watermark are dropped upstream), so
  * `handleExpiredTimer` emits the closed session EXACTLY ONCE and clears
  * the state. This is the streaming dual of the batch 30-min-gap
  * sessionize query: output rows appear only when sessions close, not on
  * every event — the shape a downstream session-fact table wants.
  *
  * Scale posture: state is one small struct + one timer per LIVE key;
  * closed sessions leave nothing behind. Timer scan per batch is over
  * registered timers only (RocksDB column family), not over all keys.
  */
object SessionTimers {

  case class Click(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class Session(user_id: Long, n: Long, total: Double,
      start_ms: Long, end_ms: Long)
  private case class Open(n: Long, total: Double, start: Long, end: Long)

  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Click, Session] {
    @transient private var open: ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState("open", Encoders.product[Open],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Click],
        timerValues: TimerValues): Iterator[Session] = {
      var st = if (open.exists()) open.get() else Open(0L, 0.0, Long.MaxValue, Long.MinValue)
      val hadTimer = open.exists()
      val oldExpiry = st.end + gapMs
      rows.foreach { c =>
        val ms = c.ts.getTime
        st = Open(st.n + 1, st.total + c.value,
          math.min(st.start, ms), math.max(st.end, ms))
      }
      open.update(st)
      // one live timer per key: re-arm at the new session end
      if (hadTimer) getHandle.deleteTimer(oldExpiry)
      getHandle.registerTimer(st.end + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) return Iterator.empty
      val st = open.get()
      open.clear()
      Iterator.single(Session(key, st.n, st.total, st.start, st.end))
    }
  }

  /** Closed-session stream: input must carry an event-time watermark at
    * least as large as `gap` (late data past the watermark would
    * otherwise reopen an already-emitted session). */
  def closedSessions(clicks: Dataset[Click],
      gap: java.time.Duration = java.time.Duration.ofMinutes(30)): Dataset[Session] = {
    import clicks.sparkSession.implicits._
    clicks.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
