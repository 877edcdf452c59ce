package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skewed-graph characterization (r9 verdict directive 7): every graph
  * decade row in SCALING.md is measured on ScaleData's
  * structure-preserving replicas — uniform degree growth. Real graphs are
  * power-law, so this probe synthesizes a Zipf(1)-in-degree edge table at
  * two sizes and times the four graph operators on it, with AQE on/off as
  * interleaved arms (outputs asserted identical — all four operators are
  * integer-exact/deterministic), to document where AQE's runtime skew
  * handling does and does not reach the round joins.
  *
  * Edge generation is deterministic (no RNG, the repo's hash-derived
  * discipline): edge i connects a UNIFORM u = xxhash64(2i+1) mod n to a
  * ZIPF v = ⌊exp(U·ln n)⌋ with U = uniform-from-hash — inverse-CDF of
  * p(v) ∝ 1/v, so node 1 receives ~m/ln(n) edges (a true hot key: ~6% of
  * all edges at n=10⁵). Self-loops dropped; operators dedup internally.
  * The edge table is localCheckpoint'ed so arms time the operator, never
  * the generator.
  *
  * Usage: runMain graft.tools.ZipfGraphProbe [rounds=3]
  */
object ZipfGraphProbe {
  def main(args: Array[String]): Unit = {
    val rounds = args.lift(0).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    import spark.implicits._

    def zipfEdges(m: Long, n: Long): DataFrame =
      spark.range(m).select(
          (pmod(xxhash64($"id" * 2 + 1), lit(n)) + 1).as("u"),
          least(lit(n), greatest(lit(1L),
            floor(exp((pmod(xxhash64($"id" * 2), lit(1000000000L)) + 1)
              .cast("double") / 1e9 * math.log(n.toDouble))).cast("long")))
            .as("v"))
        .filter($"u" =!= $"v")
        .localCheckpoint()

    def ab(tag: String, ops: Seq[(String, () => Seq[String])]): Unit =
      ops.foreach { case (op, f) =>
        f() // warm codegen
        var (bOn, bOff) = (Double.MaxValue, Double.MaxValue)
        (1 to rounds).foreach { r =>
          def timed(aqe: Boolean): (Double, Seq[String]) = {
            spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
            val t0 = System.nanoTime()
            val out = f()
            ((System.nanoTime() - t0) / 1e9, out)
          }
          val (tOn, oOn) = timed(aqe = true)
          val (tOff, oOff) = timed(aqe = false)
          require(oOn == oOff, s"$tag/$op arms diverge")
          bOn = math.min(bOn, tOn); bOff = math.min(bOff, tOff)
          println(f"[zipfgraph] $tag $op round $r: aqe $tOn%.3fs noaqe $tOff%.3fs")
        }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        println(f"[zipfgraph] RESULT $tag $op aqe_best=$bOn%.3fs noaqe_best=$bOff%.3fs")
      }

    for ((m, n, tag) <- Seq((1000000L, 100000L, "1M"), (4000000L, 200000L, "4M"))) {
      val e = zipfEdges(m, n)
      val hot = e.groupBy($"v").agg(count(lit(1)).as("d"))
        .orderBy($"d".desc).limit(3).collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[zipfgraph] $tag edges=${e.count()} hottest_in_degree $hot")
      ab(tag, Seq(
        "pr1" -> (() => graft.operators.PageRank
          .run(e.select($"u".as("a"), $"v".as("b")), iters = 3)
          .agg(count(lit(1)), sum($"rank")).collect().map(_.toString).toSeq),
        "lp1" -> (() => graft.operators.LabelPropagation.run(e, rounds = 3)
          .agg(count(lit(1)), sum($"label")).collect().map(_.toString).toSeq),
        "kc1" -> (() => graft.operators.KCore.peelRounds(e, k = 8, rounds = 6)
          .collect().map(_.toString).toSeq),
        "tc1" -> (() => graft.operators.TriangleCount
          .run(e.select($"u", $"v").distinct())
          .collect().map(_.toString).toSeq)))
    }
    spark.stop()
  }
}
