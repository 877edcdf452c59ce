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
  * a per-node rank window). The labels frame stays node-sized; rounds are
  * fixed; `localCheckpoint` truncates lineage each round, the same
  * iterative discipline as PageRank/KCore. 100 TB shape: rounds × (one
  * shuffle join + agg) over the edge list, nothing accumulates.
  */
object LabelPropagation {

  /** `edges`: columns (u, v), treated as undirected (symmetrized and
    * deduped internally). Returns (node, label) after `rounds` synchronous
    * majority updates from the all-distinct initialization. */
  def run(edges: DataFrame, rounds: Int): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("u"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("u").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
