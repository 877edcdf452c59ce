package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous majority label propagation (LPA community detection,
  * Raghavan et al. 2007) — a FIXED number of synchronous rounds with a
  * deterministic tie-break, which is what makes the result reproducible
  * and oracle-checkable (classic async LPA is order-dependent).
  *
  * Distinct from [[ConnectedComponents]]: min-label propagation converges
  * to components; MAJORITY propagation splits a component into densely
  * connected communities — a bridge edge carries one vote and loses to
  * either side's internal majority.
  *
  * Per round: one equijoin (labels onto edge targets) and two mergeable
  * hash aggregations — votes per (node, label), then argmax by
  * (count desc, label asc) as a single `max(struct(cnt, -label))` (never
  * a per-node rank window). The labels frame stays node-sized and rounds
  * are fixed. Checkpoint discipline: the SYMMETRIZED edge list — read by
  * every round — is localCheckpoint'ed once so its union+distinct runs
  * one time, while the labels lineage (3 join+agg layers) stays LAZY:
  * per-round eager checkpoints would serialize three separate jobs where
  * one suffices (measured best-of-3 5.0 s → 2.5 s at sf0.1/local[32]).
  * Long runs re-checkpoint labels every 5 rounds to bound plan growth,
  * the PageRank/KCore discipline.
  */
object LabelPropagation {

  /** `edges`: columns (u, v), treated as undirected (symmetrized and
    * deduped internally). Returns (node, label) after `rounds` synchronous
    * majority updates from the all-distinct initialization.
    *
    * Shuffle geometry (r9, the [[PageRank]] symDeg lesson applied): sym is
    * checkpointed PRE-PARTITIONED on the per-round join key `v` —
    * LogicalRDD keeps the hash partitioning across the checkpoint, so no
    * round re-shuffles the edge list (the r8 shape paid one edge-wide sym
    * shuffle EVERY round: distinct()'s (u, v) partitioning doesn't satisfy
    * the join's clustering on v). The build itself stays one shuffle:
    * hash partitioning on v alone satisfies the dedup's (u, v) clustering,
    * so distinct() runs on the repartition exchange without another. Each
    * round then pays exactly one edge-wide exchange — repartition(u) after
    * the join — which co-locates BOTH vote aggregations (clustering by u
    * satisfies the (u, label) grain too), where the r8 shape paid the sym
    * shuffle plus separate (u, label) and (u) exchanges. Measured
    * interleaved-A/B (graft.tools.Lp1Probe, local[32]): see SCALING.md. */
  def run(edges: DataFrame, rounds: Int): DataFrame =
    run(edges, rounds, prePartition = true)

  private[graft] def run(edges: DataFrame, rounds: Int,
      prePartition: Boolean): DataFrame = {
    val sym0 = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    // r11: the r9 comment's "LogicalRDD keeps the hash partitioning
    // across the checkpoint" turned out to be FALSE under AQE — the
    // checkpoint came back UnknownPartitioning and every round re-shuffled
    // the edge list after all (the exact defect the shape was meant to
    // kill). Pin the partition count (explicit-N repartitions are not
    // AQE-coalesced, so the claim below is exact) and re-assert it on the
    // checkpoint; see GraftSqlBridge.assertHashPartitioned and the pr1
    // executed-plan dumps (plans/r11).
    val p = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sym1 = (if (prePartition) sym0.repartition(p, col("v")).distinct()
                else sym0.distinct())
      .localCheckpoint() // read by every round: symmetrize+dedup ONCE
    val sym =
      if (prePartition)
        org.apache.spark.sql.GraftSqlBridge.assertHashPartitioned(sym1, Seq("v"), p)
      else sym1
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    var prevCkpt: org.apache.spark.sql.DataFrame = null
    for (i <- 1 to rounds) {
      val voted = sym.join(labels.withColumnRenamed("node", "v"), "v")
      labels = (if (prePartition) voted.repartition(col("u")) else voted)
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("u"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label"))
      // bound plan depth on long runs without serializing short ones;
      // release the superseded interior checkpoint immediately (the final
      // labels plan still reads sym and the LAST checkpoint — those stay)
      if (i % 5 == 0 && i < rounds) {
        val c = labels.localCheckpoint()
        if (prevCkpt != null)
          org.apache.spark.sql.GraftSqlBridge.unpersistCheckpoint(prevCkpt)
        prevCkpt = c
        labels = c
      }
    }
    labels
  }
}
