package graft.llm
object Knn1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.GraftSession.local()
    val fn = graft.SparkEntry.queries("knn1_knn_graph")
    def run(explodeShape: Boolean): (Double, Int) = {
      sys.props("graft.knn1.explodeSym") = explodeShape.toString
      val t0 = System.nanoTime()
      val n = fn(spark, dir).collect().length
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(false); run(true)
    var (tu, te) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (a, na) = run(false); val (b, nb) = run(true)
      require(na == nb)
      tu = math.min(tu, a); te = math.min(te, b)
      println(f"[knn1probe] round $r: union $a%.3fs explode $b%.3fs")
    }
    println(f"[knn1probe] RESULT union_best=$tu%.3fs explode_best=$te%.3fs")
    spark.stop()
  }
}
