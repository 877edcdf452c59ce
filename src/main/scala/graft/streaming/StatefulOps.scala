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
}
