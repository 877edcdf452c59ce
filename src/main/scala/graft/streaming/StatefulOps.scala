package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §7.4.6 escalation path:
  * `flatMapGroupsWithState` only where built-in stateful ops can't express
  * the semantics). Example semantics the built-ins lack: per-user running
  * anomaly detection — emit an alert row whenever a user's cumulative spend
  * crosses successive multiples of a threshold, carrying the running total
  * across micro-batches (optional timeout-based state expiry).
  */
object StatefulOps {

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class SpendState(total: Double, alertsFired: Int)
  case class SpendAlert(user_id: Long, total: Double, threshold: Double)

  case class FunnelEvent(user_id: Long, event_type: String, us: Long)
  /** Earliest qualifying timestamp per stage; -1 = not reached. `seq` is a
    * per-user running update counter carried in state so consumers (and
    * the parity spec) can order the append stream's updates. */
  case class FunnelState(vUs: Long, cUs: Long, pUs: Long, seq: Long)
  case class FunnelUpdate(user_id: Long, funnel_stage: Long,
      v_us: Long, c_us: Long, p_us: Long, upd_seq: Long)

  /** Streaming funnel progression (the incremental form of
    * AnalyticsQueries.fn1): per user, earliest view, earliest click AFTER
    * that view, earliest purchase AFTER that click — state is four longs
    * per user, and EVERY accepted transition emits an update (Append mode):
    * a user advancing view→click→purchase inside one micro-batch produces
    * stage-1, -2 and -3 rows, so stage-level consumers never miss an
    * intermediate state. Events are folded in event-time order within each
    * batch; matches the batch query exactly when arrival respects
    * event-time order across batches (the watermark contract), which is
    * what the parity spec feeds. */
  def funnelProgress(events: Dataset[FunnelEvent])(
      implicit spark: SparkSession): Dataset[FunnelUpdate] = {
    import spark.implicits._
    def stage(st: FunnelState): Long =
      if (st.pUs >= 0) 3L else if (st.cUs >= 0) 2L else if (st.vUs >= 0) 1L else 0L
    def transition(st: FunnelState, e: FunnelEvent): FunnelState =
      e.event_type match {
        case "view" if st.vUs < 0 || e.us < st.vUs =>
          // an earlier view can only widen later stages' windows;
          // already-qualified clicks/purchases stay qualified
          st.copy(vUs = e.us)
        case "click" if st.vUs >= 0 && e.us > st.vUs &&
            (st.cUs < 0 || e.us < st.cUs) =>
          // a new earliest click invalidates a purchase at or before it
          // (purchase must be strictly after the click)
          if (st.pUs >= 0 && st.pUs <= e.us) st.copy(cUs = e.us, pUs = -1L)
          else st.copy(cUs = e.us)
        case "purchase" if st.cUs >= 0 && e.us > st.cUs &&
            (st.pUs < 0 || e.us < st.pUs) =>
          st.copy(pUs = e.us)
        case _ => st
      }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val prev = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, 0L))
          val (next, updates) = it.toSeq.sortBy(e => (e.us, e.event_type))
            .foldLeft((prev, Vector.empty[FunnelUpdate])) { case ((st, ups), e) =>
              val st2 = transition(st, e)
              if (st2 == st) (st, ups)
              else {
                val st3 = st2.copy(seq = st.seq + 1)
                (st3, ups :+ FunnelUpdate(user, stage(st3),
                  st3.vUs, st3.cUs, st3.pUs, st3.seq))
              }
            }
          state.update(next)
          updates.iterator
      }
  }

  /** `idleTimeout = Some("1 hour")` expires idle users' state (bounded
    * state for unbounded key spaces — production setting). None keeps
    * state forever AND lets `processAllAvailable`-style tests terminate:
    * processing-time timeouts make the stream schedule batches
    * continuously, so the no-timeout mode is the deterministic-test mode.
    */
  def spendAlerts(events: Dataset[UserEvent], threshold: Double,
      idleTimeout: Option[String] = None)(
      implicit spark: SparkSession): Dataset[SpendAlert] = {
    import spark.implicits._
    val mode =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpendState, SpendAlert](OutputMode.Append, mode) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SpendState]) =>
          if (state.hasTimedOut) {
            // idle user: expire the running total so state stays bounded
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(SpendState(0.0, 0))
            val total = prev.total + it.map(_.value).sum
            val crossed = math.floor(total / threshold).toInt
            val alerts = (prev.alertsFired until crossed).map { k =>
              SpendAlert(user, total, (k + 1) * threshold)
            }
            state.update(SpendState(total, math.max(prev.alertsFired, crossed)))
            idleTimeout.foreach(state.setTimeoutDuration)
            alerts.iterator
          }
      }
  }

  case class DayCount(event_type: String, day: String, cnt: Long)
  case class EwmaState(e: Double, n: Long)
  case class EwmaUpdate(event_type: String, day: String, n_days: Long, ewma: Double)

  /** Streaming form of AnalyticsQueries.ewma1: per-type EWMA of the daily
    * count series, carried across micro-batches as ONE (double, long) per
    * key — the state never grows with history, which is the whole point of
    * exponential smoothing as a streaming statistic. The recurrence uses
    * the SAME double literals as the batch fold (0.3 * x + 0.7 * e, not a
    * computed 1-alpha, whose rounding can differ from the 0.7 literal), so
    * a day-ordered feed reproduces the batch query's doubles EXACTLY —
    * asserted by the parity spec. Within a batch, rows sort by day: the
    * recurrence is order-sensitive, and arrival order inside a micro-batch
    * is not part of the contract (day-ordered ACROSS batches is — the
    * usual watermark contract, same as the funnel above). */
  def ewmaDaily(days: Dataset[DayCount])(
      implicit spark: SparkSession): Dataset[EwmaUpdate] = {
    import spark.implicits._
    days
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaUpdate](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[DayCount], state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(EwmaState(0.0, 0L))
          val out = it.toSeq.sortBy(_.day).map { d =>
            st =
              if (st.n == 0L) EwmaState(d.cnt.toDouble, 1L)
              else EwmaState(0.3 * d.cnt.toDouble + 0.7 * st.e, st.n + 1L)
            EwmaUpdate(key, d.day, st.n, st.e)
          }
          state.update(st)
          out.iterator
      }
  }
}
