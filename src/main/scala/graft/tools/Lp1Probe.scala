package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved one-JVM A/Bs for the two fixed-point graph rows the r8
  * verdict left unprobed (r7 directive 8):
  *
  *  - `lp1`: [[graft.operators.LabelPropagation]] with vs without the
  *    pre-partitioned edge checkpoint + single-exchange vote aggregation
  *    (the PageRank symDeg geometry applied to LPA).
  *  - `pr1`: [[graft.operators.PageRank]] lazy 3-iteration chain (the
  *    shipped shape: checkpointEvery=4 ⇒ no interior checkpoint) vs
  *    checkpointEvery=2 (the "two rank updates per checkpoint" arm —
  *    materializes after iteration 2, so the final job re-derives less).
  *
  * Usage: runMain graft.tools.Lp1Probe <dir> [rounds=5] [lp1|pr1|both]
  */
object Lp1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val which = args.lift(2).getOrElse("both")
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    import graft.core.Tables

    def ab(tag: String, arms: Seq[(String, () => Seq[String])]): Unit = {
      arms.foreach { case (_, f) => f() } // warm codegen + shuffle service
      val best = collection.mutable.Map.empty[String, Double].withDefaultValue(Double.MaxValue)
      (1 to rounds).foreach { r =>
        val outs = arms.map { case (name, f) =>
          val t0 = System.nanoTime()
          val rows = f()
          val t = (System.nanoTime() - t0) / 1e9
          best(name) = math.min(best(name), t)
          (name, t, rows)
        }
        require(outs.map(_._3).distinct.size == 1, s"$tag arms diverge")
        println(s"[lp1probe] $tag round $r: " +
          outs.map { case (n, t, _) => f"$n $t%.3fs" }.mkString(" "))
      }
      println(s"[lp1probe] RESULT $tag " +
        arms.map { case (n, _) => f"${n}_best=${best(n)}%.3fs" }.mkString(" "))
    }

    // lp1's oracle-pinned edge construction (co-supply adjacency chain)
    def edges = {
      import org.apache.spark.sql.expressions.Window
      val ps = Tables.lineitem(spark, dir)
        .select($"l_partkey".as("p"), $"l_suppkey".as("sup")).distinct()
      val w = Window.partitionBy($"p").orderBy($"sup")
      ps.withColumn("v", lead($"sup", 1).over(w))
        .filter($"v".isNotNull)
        .select($"sup".as("u"), $"v").distinct()
    }

    // r9 follow-up: the shared co-supply edge CONSTRUCTION — one
    // repartition(p) exchange feeding both the (p,sup) dedup and the
    // per-part window (the cf1 device) vs the r8 two-exchange shape
    if (which == "cosupply") ab("cosupply", Seq(
      "two-exchange" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val ps = Tables.lineitem(spark, dir)
          .select($"l_partkey".as("p"), $"l_suppkey".as("sup")).distinct()
        val w = Window.partitionBy($"p").orderBy($"sup")
        Seq(ps.withColumn("v", lead($"sup", 1).over(w))
          .filter($"v".isNotNull)
          .select($"sup".as("u"), $"v").distinct().count().toString)
      }),
      "one-exchange" -> (() => {
        import org.apache.spark.sql.expressions.Window
        val ps = Tables.lineitem(spark, dir)
          .select($"l_partkey".as("p"), $"l_suppkey".as("sup"))
          .repartition($"p").distinct()
        val w = Window.partitionBy($"p").orderBy($"sup")
        Seq(ps.withColumn("v", lead($"sup", 1).over(w))
          .filter($"v".isNotNull)
          .select($"sup".as("u"), $"v").distinct().count().toString)
      })))

    if (which == "lp1" || which == "both") ab("lp1", Seq(
      "shuffle-per-round" -> (() => graft.operators.LabelPropagation
        .run(edges, rounds = 3, prePartition = false)
        .orderBy($"node").collect().map(_.toString).toSeq),
      "prepartitioned" -> (() => graft.operators.LabelPropagation
        .run(edges, rounds = 3, prePartition = true)
        .orderBy($"node").collect().map(_.toString).toSeq)))

    def prEdges = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b"))
      .distinct()

    if (which == "pr1" || which == "both") {
      def pr(ckptEvery: Int) = graft.operators.PageRank
        .run(prEdges, iters = 3, checkpointEvery = ckptEvery, assumeDistinct = true)
        .orderBy($"v").collect().map(_.toString).toSeq
      ab("pr1", Seq(
        "lazy-chain" -> (() => pr(4)),
        "ckpt-every-2" -> (() => pr(2))))
    }

    // r10: symDeg BUILD shape — r9's deg-join-then-repartition (deg's
    // a-exchange + two join b-exchanges + a redundant repartition) vs ONE
    // repartition(b) whose clustering co-supplies dedup, degree agg, and
    // join-back (the lp1/kc1 construction). Fixed-point ranks ⇒ arms must
    // be bit-identical.
    if (which == "pr1build") {
      def pr(single: Boolean) = graft.operators.PageRank
        .run(prEdges, iters = 3, assumeDistinct = true,
          singleExchangeBuild = single)
        .orderBy($"v").collect().map(_.toString).toSeq
      // third arm: drop the UPSTREAM (a,b) distinct too — the raw joined
      // rows ride the single repartition(b) and dedup exchange-free on
      // its clustering (one barrier total, no double-run dedup agg in the
      // union's two branches)
      def prRaw = graft.operators.PageRank
        .run(Tables.lineitem(spark, dir)
            .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
            .select(($"o_custkey" * 2).as("a"), ($"l_suppkey" * 2 + 1).as("b")),
          iters = 3, assumeDistinct = false, singleExchangeBuild = true)
        .orderBy($"v").collect().map(_.toString).toSeq
      ab("pr1build", Seq(
        "deg-join-repart" -> (() => pr(false)),
        "one-exchange" -> (() => pr(true)),
        "raw-one-exchange" -> (() => prRaw)))
    }
    spark.stop()
  }
}
