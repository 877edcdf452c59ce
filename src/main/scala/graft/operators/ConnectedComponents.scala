package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering stage of a dedup pipeline (near-dup PAIRS from an LSH /
  * band equijoin are only half the job: keep-one-per-group needs the
  * transitive closure of those pairs).
  *
  * Algorithm: every node starts labeled with its own id; each round a node
  * adopts the minimum label among itself and its neighbors; stop when no
  * label changes. Converges to min-id-per-component in O(component
  * diameter) rounds. Near-dup graphs are dense small clusters (diameter
  * 2-4 in practice), so the round count stays tiny even at 100 TB; each
  * round is one hash-shuffle join + one aggregation on the EDGE list, never
  * anything quadratic. For adversarial long-path graphs the
  * large-star/small-star alternation (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") halves paths per round; this propagation loop
  * keeps the same join shape, so swapping the step is a local change.
  *
  * Scale notes: labels are localCheckpoint'ed every round — iterative joins
  * otherwise stack lineage (and re-plan cost) linearly in round count; on a
  * cluster with a checkpoint dir, `reliable = true` uses fault-tolerant
  * checkpoints instead.
  */
object ConnectedComponents {

  /** Components of the undirected graph given by `edges` (two long columns
    * `a`, `b`). Returns (v, root) with root = min node id reachable from v.
    * Nodes appear iff they occur in some edge; callers union isolated nodes
    * as (v, v) themselves.
    */
  def run(edges: DataFrame, maxIter: Int = 25, reliable: Boolean = false): DataFrame = {
    // materialize the (possibly expensive) upstream edge pipeline ONCE —
    // every round joins against it. RDD-level checkpoint, deliberately not
    // persist(): a CacheManager entry leaked from here would plan-match
    // against later unrelated queries in the session.
    val sym0 = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val sym = if (reliable) sym0.checkpoint() else sym0.localCheckpoint()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("lbl", col("v"))
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // min neighbor label per node: edge join on the label side `a`,
      // aggregated onto the `b` side — one shuffle each, both on node ids
      val nbrMin = sym.join(labels, sym("a") === labels("v"))
        .groupBy(sym("b").as("v2"))
        .agg(min(col("lbl")).as("nmin"))
      val next0 = labels.join(nbrMin, labels("v") === nbrMin("v2"), "left")
        .select(col("v"), col("lbl"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl2"))
      val next = (if (reliable) next0.checkpoint() else next0.localCheckpoint())
      changed = next.filter(col("lbl2") < col("lbl")).count()
      labels = next.select(col("v"), col("lbl2").as("lbl"))
      it += 1
    }
    require(changed == 0, s"connected components did not converge in $maxIter rounds")
    labels.select(col("v"), col("lbl").as("root"))
  }

  /** Dedup clustering: `pairs` (da, db) near-dup edges over `docIds`; every
    * doc gets a cluster root (its own id if untouched by any pair). */
  def clusters(spark: SparkSession, pairs: DataFrame, docIds: DataFrame): DataFrame = {
    val comp = run(pairs.select(col("da").as("a"), col("db").as("b")))
    docIds.select(col("doc_id"))
      .join(comp, docIds("doc_id") === comp("v"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("doc_id")).as("cluster_id"))
  }
}
