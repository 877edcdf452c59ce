package graft.llm

import org.apache.spark.sql.DataFrame

/** Interleaved one-JVM A/B for the IVF centroid-count dial
  * ([[LlmQueries.ivfCellTarget]]): the r9 fixed k=4 cell layout vs the
  * corpus-sized k = max(4, ceil(n/target)). Each arm runs END-TO-END —
  * centroid scan, broadcast assignment, within-cell pair stage, top-k /
  * dedup aggregation — with no memoization, so the measured time includes
  * the n·k assignment cost the dial adds. Arms alternate per round
  * (host-noise discipline: perf A/B must share one JVM and interleave).
  *
  * Usage: runMain graft.llm.IvfProbe <sfDir> [rounds=3] [query=both]
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val e = graft.core.Tables.embeddings(spark, dir)
    val n = e.count()
    val kDial = LlmQueries.ivfK(n)
    println(s"[ivfprobe] n=$n fixed_k=4 dial_k=$kDial")

    def cellsAt(k: Long): DataFrame =
      LlmQueries.ivfCellsAt(spark, e, LlmQueries.ivfCentsAt(spark, e, k))

    def run(q: String, k: Long): (Double, Long) = {
      val cells = cellsAt(k)
      val df = q match {
        case "sem1" => LlmQueries.sem1Cells(spark, dir, cells)
        case "knn1" => LlmQueries.knn1Cells(spark, dir, cells)
      }
      val t0 = System.nanoTime()
      val rows = df.collect().length.toLong
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    for (q <- Seq("sem1", "knn1")) {
      run(q, 4); run(q, kDial) // warm-up: codegen + scan cache, both arms
      var (bf, bd) = (Double.MaxValue, Double.MaxValue)
      var (rf, rd) = (0L, 0L)
      (1 to rounds).foreach { r =>
        val (a, na) = run(q, 4); val (b, nb) = run(q, kDial)
        bf = math.min(bf, a); bd = math.min(bd, b); rf = na; rd = nb
        println(f"[ivfprobe] $q round $r: k4 $a%.3fs ($na rows)  k$kDial $b%.3fs ($nb rows)")
      }
      println(f"[ivfprobe] RESULT $q k4_best=$bf%.3fs rows=$rf  k${kDial}_best=$bd%.3fs rows=$rd")
    }
    spark.stop()
  }
}
