package graft.tools

/** Run a single SparkEntry query repeatedly and print per-iteration wall
  * seconds — the profiling loop for optimizing one query without paying for
  * the whole bench suite. Usage: runMain graft.tools.RunOne <name> [sfDir] [iters]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.local()
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to iters) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      println(f"[runone] $name iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
