package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** Spark 4 `transformWithState` operator: per-user running spend with
  * STATE TTL — the arbitrary-state API that supersedes
  * `flatMapGroupsWithState` (SPARK-46815). What the old API could not
  * express and this one makes declarative:
  *
  *  - typed state variables with per-variable **TTL** (here: a user's
  *    running total silently expires after inactivity — the state store
  *    bounds itself without hand-rolled timeout bookkeeping);
  *  - multiple independent state variables per key (a counter and a total
  *    here, each its own column family in RocksDB).
  *
  * transformWithState requires the RocksDB state store provider; the spec
  * sets `spark.sql.streaming.stateStore.providerClass` accordingly.
  * Emits one update row per input event (processing-time mode), so a
  * downstream sink sees the running value exactly as it evolves.
  */
object TtlState {

  case class Spend(user_id: Long, value: Double)
  case class Running(user_id: Long, n: Long, total: Double)

  class SpendProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Spend, Running] {
    @transient private var nState: org.apache.spark.sql.streaming.ValueState[Long] = _
    @transient private var totState: org.apache.spark.sql.streaming.ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = new TTLConfig(ttl)
      nState = getHandle.getValueState("n", Encoders.scalaLong, cfg)
      totState = getHandle.getValueState("total", Encoders.scalaDouble, cfg)
    }

    override def handleInputRows(key: Long, rows: Iterator[Spend],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Running] = {
      var n = if (nState.exists()) nState.get() else 0L
      var tot = if (totState.exists()) totState.get() else 0.0
      val out = rows.map { r =>
        n += 1
        tot += r.value
        nState.update(n)
        totState.update(tot)
        Running(key, n, tot)
      }
      out
    }
  }

  /** Running per-user spend stream with TTL'd state. */
  def runningSpend(events: Dataset[Spend],
      ttl: java.time.Duration = java.time.Duration.ofHours(1)): Dataset[Running] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SpendProcessor(ttl),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
