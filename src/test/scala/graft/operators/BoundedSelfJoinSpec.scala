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

  test("measured task-level spread: no task shuffle-reads a dominating share of a hot block") {
    // The physical claim behind the operator: a single hot block's
    // quadratic fans out over m(m+1)/2 join keys, so the join stage's
    // per-task shuffle read is a small slice of the stage total. The
    // naive `a JOIN b ON blk` would put 100% of the block's rows in ONE
    // task (one key = one reducer). Measured via TaskEnd metrics.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import spark.implicits._
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int,
      java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics.recordsRead > 0)
          perStage.computeIfAbsent(t.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
            .add(m.shuffleReadMetrics.recordsRead)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // pin the at-scale join shape: at 100 TB neither side broadcasts and
    // AQE's small-data coalescing doesn't collapse reducers to one task —
    // both would mask the spread this fixture exists to measure
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val savedCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val savedParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // cluster-like reducer count: with the test session's default of 4,
    // a perfectly uniform spread is already 25% per task
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val n = 5000L
      val df = (0L until n).map(i => (i, "hot")).toDF("id", "blk")
      val cnt = BoundedSelfJoin.pairs(df, "blk", "id", cap = 100).count()
      assert(cnt === n * (n - 1) / 2)
      // listener events are posted asynchronously — poll until the big
      // stage (the chunk-key join's shuffle read) has arrived
      def stages = {
        import scala.jdk.CollectionConverters._
        perStage.asScala.toMap.map { case (k, v) => k -> v.asScala.toSeq }
      }
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline &&
        !stages.values.exists(_.sum > 50000L)) Thread.sleep(100)
      val (stageId, reads) = stages.maxBy(_._2.sum)
      val total = reads.sum.toDouble
      assert(total > 50000, s"join stage not captured (stage $stageId, total $total)")
      val maxShare = reads.max / total
      assert(maxShare < 0.25,
        f"one task read ${maxShare * 100}%.0f%% of the hot block's shuffle (naive would be 100%%)")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", savedCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", savedParts)
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
