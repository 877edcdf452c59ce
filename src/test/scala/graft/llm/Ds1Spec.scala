package graft.llm

import graft.SparkTestBase
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

class Ds1Spec extends SparkTestBase {

  /** Brute-force reference: longest common consecutive 3-gram-shingle run
    * between two token sequences = classic longest-common-substring DP
    * over the shingle lists; +2 converts shingle-run length to tokens. */
  private def lcsRunTokens(a: Seq[String], b: Seq[String]): Long = {
    def sh(t: Seq[String]) = t.sliding(3).filter(_.length == 3)
      .map(_.mkString("_")).toIndexedSeq
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty || sb.isEmpty) return 0L
    var best = 0
    val dp = Array.ofDim[Int](sa.length + 1, sb.length + 1)
    for (i <- 1 to sa.length; j <- 1 to sb.length)
      if (sa(i - 1) == sb(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        best = math.max(best, dp(i)(j))
      }
    if (best == 0) 0L else best.toLong + 2
  }

  test("dupSpans equals the brute-force longest-common-substring reference") {
    import spark.implicits._
    val word = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.choose(3, 14).flatMap(n => Gen.listOfN(n, word))
    val corpusGen = Gen.choose(3, 6).flatMap(k => Gen.listOfN(k, docGen))
    val prop = forAll(corpusGen) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, "en", toks.mkString(" ")) }
        .toDF("doc_id", "lang", "text")
      // freqCap high → pure span semantics (the cap is a scale guard)
      val got = LlmQueries.dupSpans(df, minTokens = 5, freqCap = 1000)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val want = (for {
        i <- docs.indices; j <- docs.indices if i < j
        run = lcsRunTokens(docs(i), docs(j)) if run >= 5
      } yield ((i.toLong, j.toLong), run)).toMap
      got == want
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(30))
    assert(r.passed, r.status.toString)
  }

  test("the frequency cap drops self-repeated shingles from pairing") {
    import spark.implicits._
    // "a a a a a a" is one shingle value repeated 4 times in each doc:
    // cap=3 drops it entirely → no pair; cap=10 keeps it → a full run
    val df = Seq((0L, "en", "a a a a a a"), (1L, "en", "a a a a a a"))
      .toDF("doc_id", "lang", "text")
    assert(LlmQueries.dupSpans(df, minTokens = 3, freqCap = 3).count() === 0L)
    val kept = LlmQueries.dupSpans(df, minTokens = 3, freqCap = 10).collect()
    assert(kept.length === 1 && kept.head.getLong(2) === 6L)
  }
}
