package graft.functions

import graft.SparkTestBase
import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

class SimHash16Spec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("native SimHash16 equals the 16-HOF declarative fold on the corpus") {
    import spark.implicits._
    val both = docs.select($"doc_id",
      TextOps.simhashCol(TextOps.tokens($"text")).as("hof"),
      TextOps.simhashNative(TextOps.tokens($"text")).as("native"))
    assert(both.filter($"hof" =!= $"native").count() === 0L)
    assert(both.select(countDistinct($"native")).head.getLong(0) > 1L)
  }

  test("null array propagates null; null/duplicate elements handled") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a")), // duplicate counts once
      (2L, Seq("a", "b")),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "toks")
    val out = df.select($"id", TextOps.simhashNative($"toks").as("sh")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L) === out(2L)) // distinct-set semantics
    assert(out(3L) === None)
    // element-level null skipped, not poisoning the hash
    val withNullElem = Seq((4L, Seq("a", null, "b"))).toDF("id", "toks")
      .select(TextOps.simhashNative($"toks")).head
    assert(!withNullElem.isNullAt(0))
  }

  test("simhash16 is registered as an injected SQL function") {
    docs.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash16(filter(split(text, ' '), x -> x <> '')) AS sh
        |FROM sh_docs""".stripMargin)
    val viaCol = docs.select(col("doc_id"),
      TextOps.simhashNative(TextOps.tokens(col("text"))).as("sh"))
    assert(viaSql.exceptAll(viaCol).isEmpty)
  }

  test("interpreted eval matches codegen (plan-level parity)") {
    import spark.implicits._
    val toks = Seq(Seq("x", "y", "z", "w"), Seq("q")).toDF("toks")
    val fromPlan = toks.select(TextOps.simhashNative($"toks")).collect().map(_.getLong(0))
    val interp = toks.collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[String](0).map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray)
      SimHash16(org.apache.spark.sql.catalyst.expressions.Literal(arr,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
        .eval(null).asInstanceOf[Long]
    }
    assert(fromPlan.toSeq === interp.toSeq)
  }
}
