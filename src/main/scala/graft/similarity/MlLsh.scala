package graft.similarity

import org.apache.spark.ml.feature.{MinHashLSH, BucketedRandomProjectionLSH}
import org.apache.spark.ml.linalg.{Vectors, VectorUDT}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Scale-path similarity joins on Spark ML's LSH estimators — the
  * built-in, battle-tested route for cluster-scale near-dup joins
  * (MinHashLSH for Jaccard over shingle sets, BucketedRandomProjectionLSH
  * for Euclidean over embeddings). The oracle-checked pipelines in
  * graft.llm are the exactly-reproducible implementations; these wrap the
  * same shapes for when approximate + fast is the right trade.
  */
object MlLsh {

  /** docs(doc_id, shingle) → sparse binary vectors over a hashed vocab. */
  def shingleVectors(shingles: DataFrame, vocabSize: Int = 1 << 18): DataFrame = {
    val toVec = udf { (idx: Seq[Long]) =>
      val uniq = idx.map(i => (((i % vocabSize) + vocabSize) % vocabSize).toInt)
        .distinct.sorted.toArray
      Vectors.sparse(vocabSize, uniq, Array.fill(uniq.length)(1.0))
    }
    shingles
      .withColumn("h", xxhash64(col("sh")))
      .groupBy(col("doc_id")).agg(collect_list(col("h")).as("hs"))
      .withColumn("features", toVec(col("hs")))
      .select(col("doc_id"), col("features"))
  }

  /** Approximate Jaccard-similarity self-join: pairs within `maxDistance`
    * (Jaccard distance = 1 − similarity). */
  def approxNearDups(docVectors: DataFrame, maxDistance: Double,
      numHashTables: Int = 8): DataFrame = {
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(docVectors)
    model.approxSimilarityJoin(docVectors, docVectors, maxDistance, "jaccard_dist")
      .select(col("datasetA.doc_id").as("da"), col("datasetB.doc_id").as("db"),
        col("jaccard_dist"))
      .filter(col("da") < col("db"))
  }

  /** Embedding ANN via random-projection buckets (Euclidean). */
  def approxNeighbors(embeddings: DataFrame, key: Array[Float], k: Int,
      bucketLength: Double = 2.0): DataFrame = {
    val toMl = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val vecs = embeddings.withColumn("features", toMl(col("embedding")))
      .select(col("vec_id"), col("features"))
    val lsh = new BucketedRandomProjectionLSH().setInputCol("features")
      .setOutputCol("hashes").setBucketLength(bucketLength)
      .setNumHashTables(4).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxNearestNeighbors(vecs,
      Vectors.dense(key.map(_.toDouble)), k).toDF()
      .select(col("vec_id"), col("distCol").as("euclidean_dist"))
  }
}
