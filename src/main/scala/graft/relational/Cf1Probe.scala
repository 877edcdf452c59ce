package graft.relational

/** Interleaved one-JVM A/B of the cf1 downstream shapes (see
  * [[GraphQueries.cf1Shape]]): the r8 lazy exploded-profile self-join
  * (TopKByScore agg re-runs per consumer) vs the r9 array-form
  * checkpointed profile + chained double-explode pair stage (agg runs
  * once). Interleaved in ONE JVM because separate runs swing 2–3× with
  * host noise; both arms must return identical rows every round.
  * Usage: runMain graft.relational.Cf1Probe <dir> [rounds=5]
  */
object Cf1Probe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--stages")) { stages(args(1)); return }
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.core.GraftSession.local()
    def run(shape: String): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = GraphQueries.cf1Shape(spark, dir, shape)
        .collect().map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    run("selfjoin-lazy"); run("arrayckpt") // warm codegen + shuffle service
    var (tOld, tNew) = (Double.MaxValue, Double.MaxValue)
    (1 to rounds).foreach { r =>
      val (a, ra) = run("selfjoin-lazy")
      val (b, rb) = run("arrayckpt")
      require(ra == rb, "arms diverge")
      tOld = math.min(tOld, a); tNew = math.min(tNew, b)
      println(f"[cf1probe] round $r: selfjoin-lazy $a%.3fs arrayckpt $b%.3fs")
    }
    println(f"[cf1probe] RESULT selfjoin_lazy_best=$tOld%.3fs arrayckpt_best=$tNew%.3fs")
    spark.stop()
  }

  /** Per-stage wall breakdown of the adopted shape (where does the sf0.1
    * second go): profile build+checkpoint / supp agg / pair stage+final. */
  private def stages(dir: String): Unit = {
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cf1stages] $label: ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    (1 to 3).foreach { round =>
      println(s"[cf1stages] --- round $round ---")
      def ulDf = Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey")
        .join(Tables.lineitem(spark, dir).select($"l_orderkey", $"l_partkey"),
          $"o_orderkey" === $"l_orderkey")
        .repartition(col("o_custkey"))
        .groupBy($"o_custkey".as("cust"), $"l_partkey".as("item"))
        .agg(count(lit(1)).as("cnt"))
      time("  sub: ul alone (scan+join+groupBy count)") { ulDf.count() }
      if (round == 1) ulDf.explain()
      val prof = time("profile (ul + topk + localCheckpoint)") {
        val topk = udaf(new graft.functions.Aggregators.TopKByScore(20))
        ulDf.groupBy($"cust").agg(topk($"cnt", $"item").as("items")).localCheckpoint()
      }
      val supp = time("supp agg (collect to mimic broadcast job)") {
        val s0 = prof.select(explode($"items").as("item"))
          .groupBy($"item").agg(count(lit(1)).as("ni"))
        s0.count(); s0
      }
      time("pairs + joins + top20") {
        val pr = prof.select(explode($"items").as("ia"), $"items")
          .select($"ia", explode($"items").as("ib"))
          .filter($"ia" < $"ib")
          .groupBy($"ia", $"ib").agg(count(lit(1)).as("co"))
        pr.filter($"co" >= 2)
          .join(broadcast(supp.toDF("ia", "na")), "ia")
          .join(broadcast(supp.toDF("ib", "nb")), "ib")
          .withColumn("cosr", $"co".cast("double") /
            (sqrt($"na".cast("double")) * sqrt($"nb".cast("double"))))
          .orderBy($"cosr".desc, $"ia", $"ib").limit(20).collect()
      }
    }
    spark.stop()
  }
}
