package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Window-frame / grouping-set / global-span extras rounding out the
  * relational surface (SURVEY W/A2 + north-star additions the reference
  * lacks: rolling frames, rollup).
  */
object Extras extends graft.core.QueryModule {

  private def vdec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  // W5+: rolling frame — 4-row moving average of event value per user
  // (rowsBetween; exact decimal sum / window count).
  def w5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(-3, 0)
    Tables.events(s, dir)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("roll_avg",
        sum(vdec($"value")).over(w).cast("double") / count(lit(1)).over(w))
      .filter($"user_id" < 10)
      .select($"user_id", $"event_id", $"roll_avg")
      .orderBy($"user_id", $"event_id")
  }
  val w5Sql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS roll_avg
      |FROM events
      |WHERE user_id < 10
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // G1: rollup over (returnflag, linestatus) — subtotal + grand-total rows,
  // null keys labelled for a stable hash.
  def g1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum(vdec($"l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
        coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
        $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus")
  }
  val g1Sql: String =
    """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
      |  coalesce(l_linestatus, '(all)') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // A2: global span = max over per-group maxima minus min over minima
  // (two-level aggregation, enterprise_warp.py:441-443) — per-user spans
  // plus the PTA-wide span appended as user_id = -1.
  def a2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val per = Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("tmin"), max(unix_micros($"ts")).as("tmax"))
    val global = per.agg(lit(-1L).as("user_id"), min($"tmin").as("tmin"),
      max($"tmax").as("tmax"))
    per.unionByName(global)
      .select($"user_id", ($"tmax" - $"tmin").as("span_us"))
      .orderBy($"user_id")
  }
  val a2Sql: String =
    """WITH per AS (
      |  SELECT user_id, min(epoch_us(ts)) AS tmin, max(epoch_us(ts)) AS tmax
      |  FROM events GROUP BY user_id)
      |SELECT user_id, tmax - tmin AS span_us FROM per
      |UNION ALL
      |SELECT -1 AS user_id, max(tmax) - min(tmin) AS span_us FROM per
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w5_rolling_avg" -> w5,
    "g1_rollup" -> g1,
    "a2_global_tspan" -> a2,
  )
  val oracles: Map[String, String] = Map(
    "w5_rolling_avg" -> w5Sql,
    "g1_rollup" -> g1Sql,
    "a2_global_tspan" -> a2Sql,
  )
}
