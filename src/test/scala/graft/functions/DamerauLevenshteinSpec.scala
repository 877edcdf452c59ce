package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => SCTest}

class DamerauLevenshteinSpec extends SparkTestBase {

  private def d(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches DuckDB-probed reference values (unrestricted variant)") {
    // values probed from duckdb damerau_levenshtein on 2026-08-14;
    // "CA"->"ABC"=2 is THE unrestricted-vs-OSA discriminator (OSA gives 3)
    assert(d("CA", "ABC") === 2)
    assert(d("kitten", "sitting") === 3)
    assert(d("ab", "ba") === 1)
    assert(d("abcdef", "abcfad") === 3)
    assert(d("", "abc") === 3)
    assert(d("aXbY", "aYbX") === 2)
    assert(d("é", "e") === 2) // byte-based, same as DuckDB
    assert(d("éa", "aé") === 2)
  }

  test("metric axioms + Levenshtein bound hold on random byte strings") {
    val gs = Gen.listOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
    def lev(a: String, b: String): Int = {
      val (la, lb) = (a.length, b.length)
      val dp = Array.tabulate(la + 1, lb + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to la; j <- 1 to lb)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(la)(lb)
    }
    val prop = forAll(gs, gs, gs) { (a, b, c) =>
      val ab = d(a, b)
      (d(a, a) == 0) &&
        (ab == d(b, a)) &&
        (ab <= lev(a, b)) && // transpositions only ever help
        (ab >= math.abs(a.length - b.length)) &&
        (d(a, c) <= ab + d(b, c)) // triangle inequality
    }
    val r = SCTest.check(prop)(_.withMinSuccessfulTests(200))
    assert(r.passed, r.status.toString)
  }

  test("codegen and interpreted paths agree; nulls propagate") {
    import spark.implicits._
    val rows = Seq(("CA", "ABC"), ("banana", "bahama"), ("", ""), ("ab", "ba"),
      ("transpose", "tarnspose"), ("aXbY", "aYbX"))
    val df = rows.toDF("a", "b")
      .withColumn("dist", DamerauLevenshtein.dl($"a", $"b"))
    val got = df.select("dist").as[Int].collect().toSeq
    assert(got === rows.map { case (a, b) => d(a, b) })
    // null-intolerant: either side null -> null
    val n = Seq((Option("x"), Option.empty[String]), (None, Some("y")))
      .toDF("a", "b")
      .select(DamerauLevenshtein.dl($"a", $"b")).collect()
    assert(n.forall(_.isNullAt(0)))
  }
}
