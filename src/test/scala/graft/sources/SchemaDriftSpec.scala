package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemaDriftSpec extends SparkTestBase {

  test("widen: integral widths, fractional promotion, incompatible errors") {
    assert(SchemaDrift.widen(IntegerType, LongType) == LongType)
    assert(SchemaDrift.widen(ShortType, IntegerType) == IntegerType)
    assert(SchemaDrift.widen(LongType, DoubleType) == DoubleType)
    assert(SchemaDrift.widen(FloatType, DoubleType) == DoubleType)
    assert(SchemaDrift.widen(StringType, StringType) == StringType)
    intercept[RuntimeException](SchemaDrift.widen(StringType, LongType))
  }

  test("three drifting shards read as one stable schema with typed nulls") {
    import spark.implicits._
    val base = tmpDir("drift")
    // era 1: int ids, no quality column
    Seq((1, "a"), (2, "b")).toDF("id", "text")
      .withColumn("id", $"id".cast("int"))
      .write.parquet(s"$base/era1")
    // era 2: ids outgrew int32; adds a float quality score
    Seq((3L, "c", 0.5f), (4L, "d", 0.7f)).toDF("id", "text", "quality")
      .write.parquet(s"$base/era2")
    // era 3: quality became double; adds provenance
    Seq((5L, "e", 0.9, "crawl2")).toDF("id", "text", "quality", "prov")
      .write.parquet(s"$base/era3")

    val df = SchemaDrift.readUnion(spark,
      Seq(s"$base/era1", s"$base/era2", s"$base/era3"))
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("id", LongType), ("text", StringType),
      ("quality", DoubleType), ("prov", StringType)))
    val rows = df.orderBy("id").collect()
    assert(rows.length === 5)
    assert(rows(0).getLong(0) === 1L && rows(0).isNullAt(2) && rows(0).isNullAt(3))
    assert(math.abs(rows(2).getDouble(2) - 0.5) < 1e-6) // float widened, not mangled
    assert(rows(4).getString(3) === "crawl2")
  }

  test("the union is zero-shuffle and per-shard scans keep pushdown") {
    import spark.implicits._
    val base = tmpDir("drift-plan")
    Seq((1, 10L)).toDF("k", "v").write.parquet(s"$base/s1")
    Seq((2L, 20L)).toDF("k", "v").write.parquet(s"$base/s2")
    val df = SchemaDrift.readUnion(spark, Seq(s"$base/s1", s"$base/s2"))
      .filter($"k" > 1)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters"), formatted.take(1000))
  }

  test("incompatible shard schemas fail loudly, not silently") {
    import spark.implicits._
    val base = tmpDir("drift-bad")
    Seq((1L, "x")).toDF("id", "meta").write.parquet(s"$base/a")
    Seq((2L, 42L)).toDF("id", "meta").write.parquet(s"$base/b")
    intercept[RuntimeException](
      SchemaDrift.readUnion(spark, Seq(s"$base/a", s"$base/b")))
  }
}
