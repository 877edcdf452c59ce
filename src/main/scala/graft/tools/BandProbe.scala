package graft.tools

import org.apache.spark.sql.functions._

/** Banding-knee probe (r6 verdict directive 8): MEASURE the claim that
  * d6b's 4×32-bit bands hold where d6's 4×16-bit bands knee.
  *
  * The claim (argued in LlmQueries d6/d6b comments): with B-bit bands a
  * RANDOM (non-near-dup) band collision costs ≈ n²/2^(B+1) candidate rows
  * per band, so 16-bit bands start drowning the popcount verify in false
  * candidates as corpora approach ~65k docs per band value while 32-bit
  * bands push that knee past 2³². This probe isolates the banding geometry
  * from text hashing: synthetic corpora of n docs with xxhash64-derived
  * uniform chunk values, PLUS a fixed skew block of near-identical docs
  * (64 clusters × 64 members sharing all chunk values — the true-dup
  * recall load both schemes must emit), joined with the exactly-once
  * first-equal-band rule d6/d6b use. Reported per (n, band width):
  * candidate rows, the true-pair floor, false candidates, and the join's
  * wall seconds — at 16 bits false candidates grow ~n² while 32 bits stay
  * at the true-pair floor.
  *
  * Usage: runMain graft.tools.BandProbe [outFile] — appends a
  * "## banding knee probe" section (default SCALING.md).
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SCALING.md")
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    val SkewClusters = 64
    val SkewSize = 64
    val truePairs = SkewClusters.toLong * (SkewSize.toLong * (SkewSize - 1) / 2)

    def probe(n: Long, bits: Int): (Long, Double) = {
      val mask = (1L << bits) - 1
      // uniform block: 4 independent chunk values per doc; skew block:
      // cluster-keyed chunks (identical inside a cluster, distinct across)
      val docs = spark.range(n).select(
        (($"id" + 1000000000L).as("doc_id") +:
          (0 until 4).map(c =>
            abs(xxhash64($"id", lit(c))).bitwiseAND(lit(mask)).as(s"sh$c"))): _*)
      val skew = spark.range(SkewClusters.toLong * SkewSize).select(
        ($"id".as("doc_id") +:
          (0 until 4).map(c =>
            abs(xxhash64(($"id" % SkewClusters), lit(100 + c)))
              .bitwiseAND(lit(mask)).as(s"sh$c"))): _*)
      val sh = docs.unionByName(skew).localCheckpoint()
      def side(p: String) = sh.select(($"doc_id".as(s"d$p") +:
        (0 until 4).map(c => col(s"sh$c").as(s"sh$c$p"))): _*)
      val cand = (0 until 4).map { c =>
        val firstMatch = (0 until c)
          .map(k => col(s"sh${k}a") =!= col(s"sh${k}b"))
          .foldLeft(col(s"sh${c}a") === col(s"sh${c}b"))(_ && _)
        side("a").join(side("b"), firstMatch && $"da" < $"db")
          .select($"da", $"db")
      }.reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val rows = cand.count()
      (rows, (System.nanoTime() - t0) / 1e9)
    }

    val ns = Seq(30000L, 100000L, 300000L)
    val sb = new StringBuilder
    sb ++= "\n## banding knee probe (graft.tools.BandProbe)\n\n"
    sb ++= s"Synthetic corpora: n uniform simhash chunk rows + a fixed skew block\n"
    sb ++= s"($SkewClusters clusters × $SkewSize near-identical docs ⇒ $truePairs true pairs both\n"
    sb ++= "schemes must emit). Candidates = first-equal-band join output; false =\n"
    sb ++= "candidates − true floor. 16-bit bands (d6 geometry) pay ~n²/2¹⁷ false\n"
    sb ++= "rows per band; 32-bit bands (d6b geometry) stay at the floor.\n\n"
    sb ++= "| n uniform docs | band bits | candidates | false candidates | join sec |\n"
    sb ++= "|---|---|---|---|---|\n"
    for (n <- ns; bits <- Seq(16, 32)) {
      val (rows, sec) = probe(n, bits)
      val falseCand = rows - truePairs
      sb ++= f"| $n | $bits | $rows | $falseCand | $sec%.2f |\n"
      println(f"[bandprobe] n=$n bits=$bits candidates=$rows false=$falseCand $sec%.2f s")
    }
    sb ++= "\nReading the table: both schemes emit the identical true-pair floor\n"
    sb ++= "(recall is pigeonhole-guaranteed either way); the 16-bit column's\n"
    sb ++= "false-candidate count is the quadratic term the d6b comment predicts\n"
    sb ++= "(≈ 4·n²/2¹⁷), and the 32-bit column holds the floor through the\n"
    sb ++= "largest n — the concrete \"band width is a corpus-size dial\" row.\n"
    val prev = if (java.nio.file.Files.exists(java.nio.file.Paths.get(out)))
      java.nio.file.Files.readString(java.nio.file.Paths.get(out)) else ""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      MdSections.upsert(prev, "## banding knee probe", sb.toString))
    println(s"[bandprobe] appended to $out")
    spark.stop()
  }
}
