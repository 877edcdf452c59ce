package graft.similarity

import graft.SparkTestBase
import graft.core.Tables
import graft.text.TextOps
import org.apache.spark.sql.functions._

class MlLshSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("ML MinHashLSH finds the same near-dup pairs the exact pipeline ranks highest") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    val sh = docs.select(col("doc_id"),
      explode(TextOps.shingles3(col("toks"))).as("sh")).distinct()
    val vecs = MlLsh.shingleVectors(sh)
    val pairs = MlLsh.approxNearDups(vecs, maxDistance = 0.3)
    assert(pairs.count() > 0)
    // every reported pair must genuinely have jaccard distance <= 0.3
    assert(pairs.agg(max("jaccard_dist")).head().getDouble(0) <= 0.3)
  }

  test("ML random-projection ANN returns k nearest by Euclidean distance") {
    val e = Tables.embeddings(spark, dir)
    val key = e.filter(col("vec_id") === 0).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val nn = MlLsh.approxNeighbors(e, key, k = 5)
    val rows = nn.collect()
    assert(rows.length === 5)
    // vec 0 itself is its own nearest neighbor at distance 0
    assert(rows.exists(r => r.getLong(0) === 0L && r.getDouble(1) === 0.0))
  }
}
