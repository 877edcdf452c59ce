package graft.llm

import org.apache.spark.sql.DataFrame

/** Interleaved one-JVM A/B for the r11 two-level IVF assignment
  * ([[LlmQueries.ivfCellsAt]], VERDICT r10 directive 1).
  *
  * Three measurements, all noop-sink-forced (guide §1.4 — a count() would
  * let the optimizer prune the argmax columns and time only the exchange):
  *
  *  1. SUBLINEARITY: assignment-stage seconds at k = dial, 4×, 16×, 64×
  *     dial, flat vs two-level arms alternating. Flat work is n·k, so its
  *     row should scale ∝ k; two-level is n·(√k + k/√k) ∝ √k. This is the
  *     "assignment cost sublinear in k in a probe row" the verdict asks
  *     for.
  *  2. IDENTITY (fine-stage join strategy): two-level broadcast vs
  *     two-level SHUFFLE_HASH cell outputs asserted EQUAL at the dial k —
  *     the extreme-scale join flip ([[LlmQueries.ivfFineShuffleMinK]])
  *     must be a pure physical choice.
  *  3. IDENTITY (degeneracy): at any k ≤ [[LlmQueries.ivfTwoLevelMin]] the
  *     mode="twolevel" arm routes kc = 1 and must equal the flat arm
  *     bit-for-bit (the gate-SF invariance argument).
  *
  * The two-level GEOMETRY at k > threshold intentionally differs from
  * flat (coarse routing is approximate): its correctness evidence is the
  * mirrored DuckDB CTE chain (sf0.01 + sf1 oracle gates), not an identity
  * assertion — same contract as the r10 centroid dial.
  *
  * Usage: runMain graft.llm.Ivf2Probe <sfDir> [rounds=3]
  */
object Ivf2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val e = graft.core.Tables.embeddings(spark, dir)
    val n = e.count()
    val dialK = LlmQueries.ivfK(n)
    println(s"[ivf2probe] n=$n dial_k=$dialK coarse_kc=${LlmQueries.ivfCoarseK(dialK)}")

    def cellsAt(k: Long, mode: String): DataFrame =
      LlmQueries.ivfCellsAt(spark, e,
        LlmQueries.ivfCentsAt(spark, e, k), mode)

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // --- 1. sublinearity sweep -------------------------------------
    val ks = Seq(dialK, dialK * 4, dialK * 16, dialK * 64).filter(_ < n)
    ks.foreach { k => time(cellsAt(k, "flat")); time(cellsAt(k, "twolevel")) } // warm
    ks.foreach { k =>
      var (bf, bt) = (Double.MaxValue, Double.MaxValue)
      (1 to rounds).foreach { r =>
        val tf = time(cellsAt(k, "flat"))
        val tt = time(cellsAt(k, "twolevel"))
        bf = math.min(bf, tf); bt = math.min(bt, tt)
        println(f"[ivf2probe] assign k=$k round $r: flat $tf%.3f s  twolevel $tt%.3f s")
      }
      val kcForced = math.max(1L, math.ceil(math.sqrt(k.toDouble)).toLong)
      println(f"[ivf2probe] RESULT assign k=$k kc=$kcForced flat_best=$bf%.3f s  twolevel_best=$bt%.3f s")
    }

    // --- 2. broadcast vs shuffle fine stage: identical cells --------
    val ob = cellsAt(dialK, "twolevel").collect().map(_.toString).sorted.toSeq
    val os = cellsAt(dialK, "twolevel-shuffle").collect().map(_.toString).sorted.toSeq
    require(ob == os, "fine-stage broadcast vs shuffle outputs differ!")
    println(s"[ivf2probe] IDENTITY fine-stage broadcast == shuffle_hash (${ob.size} rows)")

    // --- 3. dial degeneracy: auto == flat at/below the threshold -----
    val kSmall = math.min(LlmQueries.ivfTwoLevelMin, n - 1)
    val of = cellsAt(kSmall, "flat").collect().map(_.toString).sorted.toSeq
    val ot = cellsAt(kSmall, "auto").collect().map(_.toString).sorted.toSeq
    require(of == ot, s"auto at k=$kSmall must route flat!")
    println(s"[ivf2probe] IDENTITY k=$kSmall auto == flat (${of.size} rows)")

    // --- end-to-end: sem1/knn1 at the dial k, both assignment arms ---
    def e2e(q: String, mode: String): (Double, Long) = {
      val cells = cellsAt(dialK, mode)
      val df = q match {
        case "sem1" => LlmQueries.sem1Cells(spark, dir, cells)
        case "knn1" => LlmQueries.knn1Cells(spark, dir, cells)
      }
      val t0 = System.nanoTime()
      val rows = df.collect().length.toLong
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    for (q <- Seq("sem1", "knn1")) {
      e2e(q, "flat"); e2e(q, "twolevel") // warm
      var (bf, bt) = (Double.MaxValue, Double.MaxValue)
      var (rf, rt) = (0L, 0L)
      (1 to rounds).foreach { r =>
        val (a, na) = e2e(q, "flat"); val (b, nb) = e2e(q, "twolevel")
        bf = math.min(bf, a); bt = math.min(bt, b); rf = na; rt = nb
        println(f"[ivf2probe] $q round $r: flat $a%.3f s ($na rows)  twolevel $b%.3f s ($nb rows)")
      }
      println(f"[ivf2probe] RESULT $q flat_best=$bf%.3f s rows=$rf  twolevel_best=$bt%.3f s rows=$rt")
    }
    spark.stop()
  }
}
