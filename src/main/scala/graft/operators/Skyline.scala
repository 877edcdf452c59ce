package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto front): the rows not strictly dominated
  * under (maximize `x`, minimize `y`) — "largest revenue, soonest" style
  * preference queries.
  *
  * The SQL semantic (`NOT EXISTS` a dominating row) is an O(n²) nested
  * loop, and the window form (`y < running min of y over x desc`) needs a
  * single-partition global sort — both non-starters at scale. This is the
  * classic two-phase distributed skyline instead:
  *
  *  1. per-partition sweep (`mapPartitions` — genuine per-partition
  *     imperative logic): sort the partition by (x desc, y asc) and keep
  *     a point iff it improves the running best y (ties kept only for
  *     exact (x, y) duplicates, which are mutually non-dominating). Cost
  *     O(p log p) per partition, NO shuffle, and the local front is
  *     typically a tiny fraction of the partition (O(log n) expected for
  *     independent dims);
  *  2. the union of local fronts — the global front is provably a subset
  *     of it — collapses into ONE partition for a final identical sweep.
  *     That single task sees only k·|front| rows, not the data; if fronts
  *     ever grow adversarially the same merge nests another level.
  *
  * Dominance: A beats B iff A.x ≥ B.x ∧ A.y ≤ B.y ∧ (A.x > B.x ∨
  * A.y < B.y). Exact duplicates of a front point all survive (no strict
  * dominance either way) — matching the `NOT EXISTS` oracle bit for bit.
  */
object Skyline {

  def pareto2D(df: DataFrame, x: Column, y: Column): DataFrame = {
    val withKeys = df.withColumn("__sx", x.cast("double"))
      .withColumn("__sy", y.cast("double"))
    val sch = withKeys.schema
    val (xi, yi) = (sch.fieldIndex("__sx"), sch.fieldIndex("__sy"))

    def sweep(it: Iterator[Row]): Iterator[Row] = {
      val pts = it.toArray.sortBy(r => (-r.getDouble(xi), r.getDouble(yi)))
      var bestY = Double.PositiveInfinity
      var bestX = Double.NaN
      pts.iterator.filter { r =>
        val (px, py) = (r.getDouble(xi), r.getDouble(yi))
        if (py < bestY) { bestY = py; bestX = px; true }
        else py == bestY && px == bestX // exact duplicate of the frontier point
      }
    }

    val spark = df.sparkSession
    val local = spark.createDataFrame(withKeys.rdd.mapPartitions(sweep), sch)
    spark.createDataFrame(local.coalesce(1).rdd.mapPartitions(sweep), sch)
      .drop("__sx", "__sy")
  }
}
