package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

class CdcChunksSpec extends SparkTestBase {

  private def chunks(toks: Column, divisor: Int = 8): Column =
    GraftSqlBridge.column(CdcChunks(GraftSqlBridge.expression(toks), divisor))

  test("matches the HOF zip_with/aggregate fold on real documents") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val hof = expr(
      """CASE WHEN size(toks) = 0 THEN cast(array() as array<string>) ELSE
        |aggregate(
        |  zip_with(toks,
        |    transform(sequence(1, size(toks)), p -> p >= 4 AND
        |      (11 * element_at(cs, p) + 7 * element_at(cs, p - 1)
        |       + 5 * element_at(cs, p - 2) + 3 * element_at(cs, p - 3)) % 8 = 0),
        |    (t, b) -> struct(t AS t, b AS b)),
        |  struct(cast(array() as array<string>) AS done, '' AS cur),
        |  (acc, x) -> struct(
        |    IF(x.b, array_append(acc.done,
        |         IF(acc.cur = '', x.t, concat(acc.cur, ' ', x.t))), acc.done) AS done,
        |    IF(x.b, '', IF(acc.cur = '', x.t, concat(acc.cur, ' ', x.t))) AS cur),
        |  acc -> IF(acc.cur = '', acc.done, array_append(acc.done, acc.cur)))
        |END""".stripMargin)
    val both = docs
      .select(graft.text.TextOps.tokens(col("text")).as("toks"))
      .withColumn("cs", expr(
        """transform(toks, tok ->
          |  aggregate(transform(split(tok, ''), (ch, j) -> ascii(ch) * (j + 1)),
          |            0L, (acc, x) -> acc + x))""".stripMargin))
      .select(hof.as("hof"), chunks(col("toks")).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() === 0)
    // sanity: real boundaries exist (the parity isn't vacuous)
    assert(both.filter(size(col("native")) > 1).count() > 0)
  }

  test("no boundary before token 4; trailing partial chunk kept; empty in → empty out") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"),            // < 4 tokens → one chunk
      Seq.empty[String]              // no tokens → no chunks
    ).toDF("toks").select(chunks($"toks").as("c"))
    val rows = df.collect()
    assert(rows(0).getSeq[String](0) === Seq("a b c"))
    assert(rows(1).getSeq[String](0) === Seq.empty)
  }

  test("boundary closes the chunk AFTER the triggering token") {
    import spark.implicits._
    // construct tokens whose hashes make position 4 a boundary:
    // hash("a")=97 ... choose divisor = 1 so EVERY p>=4 is a boundary
    val df = Seq(Seq("a", "b", "c", "d", "e", "f"))
      .toDF("toks").select(chunks($"toks", divisor = 1).as("c"))
    assert(df.head().getSeq[String](0) === Seq("a b c d", "e", "f"))
  }

  test("null array propagates null") {
    import spark.implicits._
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
      .select(chunks($"toks").as("c"))
    assert(df.head().isNullAt(0))
  }
}
