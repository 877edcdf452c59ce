package graft.llm

import graft.SparkTestBase
import graft.text.TextOps
import org.apache.spark.sql.functions._

/** The simhash banding geometry is a PLAN dial, never a semantic one:
  * both candidate generators must emit the identical exact hamming ≤ 3
  * pair set (each exactly once — the count check would double on a
  * broken first-match rule). */
class SimhashGeometrySpec extends SparkTestBase {

  test("combo (20×32-bit) and band16 (4×16-bit) geometries emit identical pairs") {
    val session = spark
    import session.implicits._
    val sh = TextOps.simhashChunks(
      LlmQueries.docTids(session, "/root/testdata/sf0.001")).localCheckpoint()
    val a = LlmQueries.simhashBand16Pairs(session, sh)
      .orderBy($"da", $"db").collect().toSeq
    val b = LlmQueries.simhashComboPairs(session, sh)
      .orderBy($"da", $"db").collect().toSeq
    assert(a.nonEmpty, "fixture should contain at least one near-dup pair")
    assert(a === b)
  }

  test("combo geometry emits each pair exactly once (no distinct needed)") {
    val session = spark
    import session.implicits._
    val sh = TextOps.simhashChunks(
      LlmQueries.docTids(session, "/root/testdata/sf0.001")).localCheckpoint()
    val pairs = LlmQueries.simhashComboPairs(session, sh)
    assert(pairs.groupBy($"da", $"db").count().filter($"count" > 1).count() === 0)
  }

  test("block packing: synthetic ≤3-bit flips are always caught, 4-bit spread may not be") {
    val session = spark
    import session.implicits._
    // doc 0: fixed hash; docs 1..4: flip k bits spread across chunks
    // (worst case for banding — each flip dirties a different block)
    def row(id: Long, flips: Seq[Int]): (Long, Long, Long, Long, Long) = {
      val base = Array(0x5A5AL, 0x3C3CL, 0x0F0FL, 0x7E7EL)
      flips.foreach { g => base(g / 16) ^= (1L << (g % 16)) }
      (id, base(0), base(1), base(2), base(3))
    }
    val sh = Seq(
      row(0, Nil),
      row(1, Seq(0)),            // hamming 1
      row(2, Seq(0, 17)),        // hamming 2, two chunks
      row(3, Seq(0, 17, 34)),    // hamming 3, three chunks
      row(4, Seq(0, 17, 34, 51)) // hamming 4 — outside the contract
    ).toDF("doc_id", "sh0", "sh1", "sh2", "sh3")
    val got = LlmQueries.simhashComboPairs(session, sh)
      .filter($"da" === 0).select($"db").as[Long].collect().toSet
    assert(Set(1L, 2L, 3L).subsetOf(got))
    assert(!got.contains(4L)) // hamming filter holds regardless of banding
  }
}
