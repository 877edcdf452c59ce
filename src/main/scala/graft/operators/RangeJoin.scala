package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval range join.
  *
  * Spark's built-in strategy for `a.ts BETWEEN b.lo AND b.hi` is
  * BroadcastNestedLoopJoin (O(n·m), one side broadcast) — unusable when both
  * sides are fact-sized. This operator maps the classic bucketed range join
  * onto Catalyst primitives:
  *
  *  1. intervals explode into the fixed-width buckets they cover
  *     (`sequence(floor(lo/w), floor(hi/w))` — bounded by `span/w + 1`);
  *  2. points map to their single bucket;
  *  3. shuffle EQUIJOIN on the bucket key (hash-partitioned, AQE-skew-safe);
  *  4. exact interval predicate refines the candidates.
  *
  * Choose `bucketWidth` ≈ the typical interval span: expansion stays O(1)
  * per interval and each point meets only its own bucket's intervals.
  * Left-outer semantics keep interval rows with no matching points (the
  * refined predicate lands in the join condition, not a post-filter).
  */
object RangeJoin {

  /** floor(a / w) exact over the full long range: subtract the positive
    * modulus first (the remainder-free value divides exactly; `round` clears
    * the double-division ulps that a plain `floor(a/w)` accumulates for
    * ns-epoch magnitudes beyond 2^53). */
  private def floorDiv(a: Column, w: Long): Column =
    round((a - pmod(a, lit(w))) / lit(w)).cast("long")

  /** Join `points` (timestamp column `pts`) into `intervals` rows whose
    * `(lo, hi]` half-open interval contains the point. `lo`/`hi`/`pts` are
    * long epoch values. Inner join emits each (interval, point) pair exactly
    * once (a point matches only its own bucket). With `"left_outer"`,
    * intervals with no point in SOME covered bucket additionally emit a
    * null-point row — exact for aggregate consumers (`count(point_col)`
    * skips nulls); row-level consumers should deduplicate or post-filter. */
  def pointInInterval(intervals: DataFrame, lo: Column, hi: Column,
      points: DataFrame, pts: Column, bucketWidth: Long,
      joinType: String = "left_outer"): DataFrame = {
    val iv = intervals
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__bk", explode(sequence(floorDiv(lo, bucketWidth),
        floorDiv(hi, bucketWidth))))
    val pt = points.withColumn("__pts", pts)
      .withColumn("__bk", floorDiv(pts, bucketWidth))
    iv.join(pt, iv("__bk") === pt("__bk") &&
        pt("__pts") > iv("__lo") && pt("__pts") <= iv("__hi"), joinType)
      .drop("__bk", "__lo", "__hi", "__pts")
  }

  /** Interval×interval OVERLAP join: inner-joins `left` [llo, lhi) to
    * `right` [rlo, rhi) pairs with `llo < rhi && rlo < lhi` (half-open
    * overlap), as a bucketed equijoin — the device that makes the
    * inequality-only join (BroadcastNestedLoopJoin in stock Spark, O(n·m))
    * a shuffle join when both sides are fact-sized.
    *
    * Both sides explode into the fixed-width buckets they cover. A pair
    * overlapping within several SHARED buckets would emit once per bucket,
    * so each pair is CLAIMED by exactly one: the bucket containing
    * `max(llo, rlo)` — the overlap's left edge, which lies inside both
    * sides' covered ranges (llo ≤ max < lhi since rlo < lhi, and
    * symmetrically), so the claim never loses a pair and never double
    * counts. Exactly-once is property-tested against the brute-force
    * definition in RangeJoinSpec.
    */
  def intervalOverlap(left: DataFrame, llo: Column, lhi: Column,
      right: DataFrame, rlo: Column, rhi: Column, bucketWidth: Long): DataFrame = {
    val a = left
      .withColumn("__alo", llo).withColumn("__ahi", lhi)
      .withColumn("__bk", explode(sequence(floorDiv(llo, bucketWidth),
        floorDiv(lhi, bucketWidth))))
    val b = right
      .withColumn("__blo", rlo).withColumn("__bhi", rhi)
      .withColumn("__bk", explode(sequence(floorDiv(rlo, bucketWidth),
        floorDiv(rhi, bucketWidth))))
    a.join(b, a("__bk") === b("__bk") &&
        a("__alo") < b("__bhi") && b("__blo") < a("__ahi") &&
        a("__bk") === floorDiv(greatest(a("__alo"), b("__blo")), bucketWidth))
      .drop("__bk", "__alo", "__ahi", "__blo", "__bhi")
  }
}
