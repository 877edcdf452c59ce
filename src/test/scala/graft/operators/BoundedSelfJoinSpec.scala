package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BoundedSelfJoinSpec extends SparkTestBase {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getStruct(0).getAs[Long]("id"),
      r.getStruct(1).getAs[Long]("id"))).toSet

  private def naiveSet(rows: Seq[(Long, String)]): Set[(Long, Long)] =
    (for {
      (ia, ba) <- rows; (ib, bb) <- rows
      if ba == bb && ia < ib
    } yield (ia, ib)).toSet

  test("pair set equals the naive all-pairs join on a skewed fixture (recall unchanged)") {
    import spark.implicits._
    // one hot block of 100 rows + several small blocks — the shape that
    // degrades the naive self-join to a single quadratic task
    val rows = (0L until 100L).map(i => (i, "hot")) ++
      (100L until 130L).map(i => (i, s"cold${i % 7}"))
    val df = rows.toDF("id", "blk")
    val got = pairSet(BoundedSelfJoin.pairs(df, "blk", "id", cap = 10))
    assert(got === naiveSet(rows))
    // sanity: the hot block alone contributes C(100,2) pairs
    assert(got.count { case (a, b) => a < 100 && b < 100 } === 100 * 99 / 2)
  }

  test("cap=1 (every row its own chunk) still yields the exact pair set") {
    import spark.implicits._
    val rows = (0L until 25L).map(i => (i, (i % 3).toString))
    val df = rows.toDF("id", "blk")
    assert(pairSet(BoundedSelfJoin.pairs(df, "blk", "id", cap = 1)) === naiveSet(rows))
  }

  test("huge cap (single chunk) degenerates to the plain self-join") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (i, "one"))
    val df = rows.toDF("id", "blk")
    assert(pairSet(BoundedSelfJoin.pairs(df, "blk", "id", cap = 1 << 20)) === naiveSet(rows))
  }

  test("per-chunk row count is bounded — no task sees the whole hot block") {
    import spark.implicits._
    val n = 500
    val cap = 20
    val df = (0L until n.toLong).map(i => (i, "hot")).toDF("id", "blk")
    // reproduce the operator's internal chunk assignment and measure the
    // largest chunk: each join task's side is one chunk, so this bounds
    // per-task candidates (deterministic: xxhash64 of fixed ids)
    val m = math.ceil(n.toDouble / cap).toLong
    val maxChunk = df
      .withColumn("g", pmod(xxhash64(col("id")), lit(m)))
      .groupBy("g").count().agg(max("count")).head().getLong(0)
    assert(maxChunk < 4L * cap, s"hash chunking failed to spread: $maxChunk")
    assert(m === 25L)
    // and the operator over this frame is still exact
    val got = pairSet(BoundedSelfJoin.pairs(df, "blk", "id", cap = cap))
    assert(got.size === n * (n - 1) / 2)
  }
}
