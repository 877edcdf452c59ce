package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkTestBase

class GlobalRankSpec extends SparkTestBase {

  test("withRowNumber matches a global row_number window") {
    import spark.implicits._
    val df = (1 to 977).map(i => ((i * 7919) % 1009, i)).toDF("k", "id")
    val got = GlobalRank.withRowNumber(df, Seq(col("k"), col("id")))
      .select($"k", $"id", $"rn", $"n")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy($"k", $"id")).cast("long"))
      .withColumn("n", lit(977L))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).sorted
    assert(got === want)
  }

  test("rank is contiguous 1..n and strictly follows the sort order") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i % 37, i)).toDF("k", "id")
    val rows = GlobalRank.withRowNumber(df, Seq(col("k"), col("id")))
      .select($"rn", $"k", $"id").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 500L))
    val sorted = rows.map(r => (r.getInt(1), r.getInt(2)))
    assert(sorted.toSeq === sorted.toSeq.sorted)
  }

  test("withPrefixSum matches a global running-total window") {
    import spark.implicits._
    val df = (1 to 977).map(i => (i, (i * 7919) % 101)).toDF("id", "v")
    val got = GlobalRank.withPrefixSum(df, Seq(col("id")), $"v")
      .select($"id", $"cum")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val want = df
      .withColumn("cum", sum($"v").over(
        Window.orderBy($"id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"id", $"cum")
      .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(got === want)
  }

  test("ntileFromRank reproduces NTILE semantics for uneven splits") {
    import spark.implicits._
    for (n <- Seq(5, 8, 17, 100); k <- Seq(3, 8)) {
      val df = (1 to n).map(i => (i, i)).toDF("k0", "id")
      val got = GlobalRank.withRowNumber(df, Seq(col("id")))
        .select($"id", GlobalRank.ntileFromRank($"rn", $"n", k).as("tile"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
      val want = df
        .select($"id", ntile(k).over(Window.orderBy($"id")).cast("long").as("tile"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sorted
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("empty input yields an empty result") {
    import spark.implicits._
    val df = Seq.empty[(Int, Int)].toDF("k", "id")
    assert(GlobalRank.withRowNumber(df, Seq(col("k"))).count() === 0)
  }
}
