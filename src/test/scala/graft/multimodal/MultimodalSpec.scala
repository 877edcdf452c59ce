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

  test("resize stub bounds payloads, keeps small ones, records orig_bytes") {
    import spark.implicits._
    val media = Seq(
      (1L, "image", Array.tabulate(1000)(_.toByte), Map("w" -> "100")),
      (2L, "image", Array.tabulate(16)(_.toByte), Map.empty[String, String]))
      .toDF("media_id", "kind", "content", "meta")
    val out = Multimodal.resize(media, targetBytes = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("content"), r.getMap[String, String](3))).toMap
    assert(out(1L)._1.length === 64)
    assert(out(1L)._1.head === 0.toByte) // stride sampling keeps byte 0
    assert(out(1L)._2("orig_bytes") === "1000")
    assert(out(1L)._2("w") === "100") // existing metadata preserved
    assert(out(2L)._1.length === 16) // already small: untouched
    assert(out(2L)._2("orig_bytes") === "16")
  }
}
