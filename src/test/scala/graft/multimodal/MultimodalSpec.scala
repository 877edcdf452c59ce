package graft.multimodal

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {

  private lazy val media = {
    import spark.implicits._
    val docs = Seq((1L, "hello world, a tiny payload"),
      (2L, "x" * 5000), (3L, "")).toDF("id", "txt")
    Multimodal.textAsMedia(docs, "id", "txt")
  }

  test("media schema: opaque binary + typed metadata map") {
    assert(media.schema("content").dataType.typeName === "binary")
    val m = media.filter(col("media_id") === 1).head()
    assert(m.getAs[Map[String, String]]("meta")("n_chars") === "27")
  }

  test("batched feature extraction yields fixed-dim vectors, empty-safe") {
    val feats = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder(16))
    val rows = feats.collect().sortBy(_.media_id)
    assert(rows.forall(_.features.length === 16))
    assert(rows(2).features.forall(_ === 0.0f)) // empty payload → zeros
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media, () => new Multimodal.StubDecoder(16))
      .collect().sortBy(_.media_id)
    assert(rows.map(_.features.toSeq) === again.map(_.features.toSeq))
  }

  test("chunk sampling keeps every k-th fixed-size chunk") {
    val chunks = Multimodal.sampleChunks(media.filter(col("media_id") === 2), 1000, 2)
    // 5000 bytes → 5 chunks → keep idx 0, 2, 4
    assert(chunks.select("chunk_idx").collect().map(_.getInt(0)).sorted.toSeq === Seq(0, 2, 4))
    val sizes = chunks.select(octet_length(col("chunk"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ === 1000))
  }
}
