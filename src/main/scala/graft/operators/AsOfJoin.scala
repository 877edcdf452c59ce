package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward and forward) — for each left row, the latest right
  * row with `right.ts <= left.ts` (backward) or the earliest with
  * `right.ts >= left.ts` (forward) within the same key (the canonical
  * time-series enrichment operator; Spark has no built-in).
  *
  * Implementation is the scalable union+window technique, NOT a range
  * cross-join: tag both sides, union, and take `last(right_payload,
  * ignoreNulls)` over (key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..
  * CURRENT). One shuffle on the key, linear work per partition, no
  * quadratic candidate pairs — survives 100 TB where a theta-join
  * (`l.ts >= r.ts`) plans as a broadcast-nested-loop and dies.
  * Right rows sort before left rows at equal ts (tag 0 < 1) ⇒ inclusive
  * `>=` match semantics, same as DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** Join `left` to `right` as-of backward on `tsCol` (a commensurable
    * numeric/timestamp column present in both), keyed by `key`.
    * `rightPayload` columns are appended to every left row (null when no
    * right row precedes it), plus `__matched_ts` = the matched right ts
    * (consumed by [[backwardWithin]]; drop it if unwanted).
    */
  def backward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightPayload: Seq[String]): DataFrame =
    joinImpl(left, right, key, tsCol, rightPayload, forward = false)

  /** Forward as-of join — for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` in the same key (symmetric to [[backward]]:
    * the window scans descending ts). */
  def forward(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightPayload: Seq[String]): DataFrame =
    joinImpl(left, right, key, tsCol, rightPayload, forward = true)

  private def joinImpl(left: DataFrame, right: DataFrame, key: String, tsCol: String,
      rightPayload: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    require(rightPayload.forall(right.columns.contains), "payload must exist on right")
    require(rightPayload.forall(c => !leftCols.contains(c)),
      s"payload names collide with left columns: ${rightPayload.intersect(leftCols)}")

    val l = left.withColumn("__tag", lit(1))
    val lAligned = rightPayload.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right.select((key +: tsCol +: rightPayload).distinct.map(col): _*)
      .withColumn("__tag", lit(0))
    val rAligned = leftCols.filterNot((key +: tsCol +: rightPayload).contains)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unioned = lAligned.select(("__tag" +: leftCols ++: rightPayload).map(col): _*)
      .unionByName(rAligned.select(("__tag" +: leftCols ++: rightPayload).map(col): _*))

    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(col(key)).orderBy(tsOrder, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(
      unioned.withColumn("__rts", when(col("__tag") === 0, col(tsCol))))(
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
      .withColumn("__rts", last(col("__rts"), ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1)
      .withColumn("__matched_ts", col("__rts"))
      .drop("__tag", "__rts")
  }

  /** [[backward]] with a tolerance: matches older than `tolerance` (in the
    * ts column's units) are nulled out — stale quotes don't enrich. */
  def backwardWithin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, rightPayload: Seq[String], tolerance: Long): DataFrame = {
    val joined = backward(left, right, key, tsCol, rightPayload)
    val stale = col("__matched_ts").isNull ||
      (col(tsCol) - col("__matched_ts")) > tolerance
    rightPayload.foldLeft(joined)((df, c) =>
      df.withColumn(c, when(stale, lit(null)).otherwise(col(c))))
      .drop("__matched_ts")
  }
}
