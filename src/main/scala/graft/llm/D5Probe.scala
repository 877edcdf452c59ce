package graft.llm

import org.apache.spark.sql.functions._

/** Interleaved one-JVM A/B over [[graft.operators.BoundedSelfJoin]]'s
  * chunk cap for d5: the cap was sized as a detonation guard (keep one
  * task's candidate set bounded), but it is ALSO the parallelism dial —
  * at sf1 each of the 10 labels holds ~2,180 rows, so cap=4096 puts a
  * whole label's ~2.4M pairs in ONE task and the 20M-pair job runs on 10
  * of 32 cores. Smaller chunks fan the same exact pair set over
  * m(m+1)/2 tasks per label. Outputs asserted identical (the pair set is
  * cap-invariant by construction).
  *
  * Usage: runMain graft.llm.D5Probe <sfDir> [rounds=3] [caps=4096,1024,512,256]
  */
object D5Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val caps = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4096, 1024, 512, 256))
    val spark = graft.core.GraftSession.local()
    import spark.implicits._
    def run(cap: Int): (Double, Int) = {
      val e = graft.core.Tables.embeddings(spark, dir)
        .withColumn("n2", graft.similarity.VectorOps.dotNative($"embedding", $"embedding"))
      val t0 = System.nanoTime()
      val n = graft.operators.BoundedSelfJoin.pairs(e, "label", "vec_id", cap = cap)
        .select($"a.vec_id".as("va"), $"b.vec_id".as("vb"),
          (graft.similarity.VectorOps.dotNative($"a.embedding", $"b.embedding") /
            (sqrt($"a.n2") * sqrt($"b.n2"))).as("cos"))
        .filter($"cos" > 0.4)
        .count().toInt
      ((System.nanoTime() - t0) / 1e9, n)
    }
    caps.foreach(run) // warm
    val best = collection.mutable.Map.empty[Int, Double].withDefaultValue(Double.MaxValue)
    (1 to rounds).foreach { r =>
      val outs = caps.map { c => val (t, n) = run(c); best(c) = math.min(best(c), t); (c, t, n) }
      require(outs.map(_._3).distinct.size == 1, "pair counts diverge")
      println(s"[d5probe] round $r: " + outs.map { case (c, t, _) => f"cap$c $t%.3fs" }.mkString(" "))
    }
    println("[d5probe] RESULT " + caps.map(c => f"cap${c}_best=${best(c)}%.3fs").mkString(" "))
    spark.stop()
  }
}
