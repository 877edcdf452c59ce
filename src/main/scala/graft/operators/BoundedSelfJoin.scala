package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded intra-block self-pairing: all unordered within-block pairs, with
  * every join task's candidate set capped.
  *
  * The naive `a JOIN b ON a.block = b.block AND a.id < b.id` puts a whole
  * block in ONE task — a hot block (a dominant IVF cell, a boilerplate
  * near-dup cluster) degrades to single-task O(n²) at scale. Exact
  * semantics require every within-block pair to be examined, so the
  * quadratic is irreducible — but it can be PARALLELIZED: rows hash into
  * `m = ceil(n_block / cap)` chunks, and each (chunk_i, chunk_j), i ≤ j,
  * becomes its own join key, so a task compares at most ~cap × cap rows
  * while a size-n block fans out over m(m+1)/2 tasks. Output is exactly
  * the unordered pair set (each pair once, `a.id < b.id`) — recall is
  * unchanged by construction, which is what lets callers keep their exact
  * oracles.
  *
  * Pair-meeting argument: a pair with chunks (g_x ≤ g_y) meets exactly once
  * — x broadcasts itself "left" to keys (g_x, j) for j ≥ g_x, y "right" to
  * keys (i, g_y) for i ≤ g_y; the only common key is (g_x, g_y). Same-chunk
  * pairs meet in both orientations; the id filter keeps one.
  */
object BoundedSelfJoin {

  /** All unordered within-block pairs of `df` rows as two struct columns
    * `a`, `b` (full rows, `a.<idCol> < b.<idCol>`), per-task candidates
    * bounded by ~`cap` rows per side. `idCol` must be unique per row. */
  def pairs(df: DataFrame, blockCol: String, idCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val cnts = df.groupBy(col(blockCol)).agg(count(lit(1)).as("__bn"))
      .withColumnRenamed(blockCol, "__blk")
    val rows = df
      .select(col(blockCol).as("__blk"), struct(df.columns.map(col): _*).as("__r"))
      .join(broadcast(cnts), "__blk")
      .withColumn("__m",
        greatest(lit(1L), ceil(col("__bn").cast("double") / cap).cast("long")))
      .withColumn("__g", pmod(xxhash64(col(s"__r.$idCol")), col("__m")))
    val left = rows.select(col("__blk"), col("__r").as("__ra"), col("__g").as("__ga"),
      explode(sequence(col("__g"), col("__m") - 1)).as("__j"))
    val right = rows.select(col("__blk").as("__blkb"), col("__r").as("__rb"),
      col("__g").as("__gb"), explode(sequence(lit(0L), col("__g"))).as("__i"))
    val swap = col(s"__ra.$idCol") > col(s"__rb.$idCol")
    left.join(right,
        col("__blk") === col("__blkb") &&
        col("__ga") === col("__i") && col("__j") === col("__gb"))
      // same-chunk pairs arrive in both orientations — keep one; cross-chunk
      // pairs arrive once in arbitrary orientation — canonicalize below
      .filter(col("__ga") =!= col("__gb") || col(s"__ra.$idCol") < col(s"__rb.$idCol"))
      .select(when(swap, col("__rb")).otherwise(col("__ra")).as("a"),
        when(swap, col("__ra")).otherwise(col("__rb")).as("b"))
  }
}
