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

  test("ImageIoDecoder decodes a real PNG to pixel-derived grid features") {
    import spark.implicits._
    // 8×8 PNG, left half black, right half white — built with the same JDK
    // ImageIO the decoder uses, so the fixture is real encoded bytes
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val media = Seq(
      (1L, "image", png, Map.empty[String, String]),
      (2L, "image", "not an image".getBytes, Map.empty[String, String]),
      (3L, "audio", Array.tabulate(64)(_.toByte), Map.empty[String, String]))
      .toDF("media_id", "kind", "content", "meta")
    val rows = Multimodal.extractFeatures(media, () => new Multimodal.ImageIoDecoder(4))
      .collect().sortBy(_.media_id)
    // real decode: 4×4 luminance grid — left two columns 0.0, right two 1.0
    val f = rows(0).features
    assert(f.length == 16)
    for (r <- 0 until 4; c <- 0 until 4)
      assert(math.abs(f(r * 4 + c) - (if (c < 2) 0f else 1f)) < 1e-3,
        s"cell ($r,$c) = ${f(r * 4 + c)}")
    // undecodable image payload and audio kind fall back to the stub
    val stub = new Multimodal.StubDecoder(16)
    assert(rows(1).features.toSeq == stub.decode("image", "not an image".getBytes).toSeq)
    assert(rows(2).features.toSeq == stub.decode("audio", Array.tabulate(64)(_.toByte)).toSeq)
  }

  test("AudioDecoder decodes a real WAV to frame-derived RMS features") {
    import spark.implicits._
    import javax.sound.sampled._
    // 16-bit mono WAV, 8 kHz, 4096 samples: first half a full-scale-ish
    // 440 Hz sine (RMS ≈ 0.8/√2), second half silence — encoded with the
    // same JDK AudioSystem the decoder reads, so the fixture is real bytes
    val n = 4096
    val amp = 0.8
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = if (i < n / 2)
        (amp * math.sin(2 * math.Pi * 440 * i / 8000.0) * 32767).toInt
      else 0
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray
    assert(new String(wav.take(4)) === "RIFF")

    val media = Seq(
      (1L, "audio", wav, Map.empty[String, String]),
      (2L, "audio", "not audio at all".getBytes, Map.empty[String, String]),
      (3L, "video", wav, Map.empty[String, String]))
      .toDF("media_id", "kind", "content", "meta")
    val rows = Multimodal.extractFeatures(media, () => new Multimodal.CompositeDecoder(4))
      .collect().sortBy(_.media_id)
    val f = rows(0).features
    assert(f.length === 16)
    val sineRms = amp / math.sqrt(2.0)
    for (s <- 0 until 8)  // first half: sine RMS within 5%
      assert(math.abs(f(s) - sineRms) < 0.05 * sineRms, s"segment $s = ${f(s)}")
    for (s <- 8 until 16) // second half: silence
      assert(f(s) === 0.0f, s"segment $s = ${f(s)}")
    // undecodable audio falls back to byte-window stub features
    val stub = new Multimodal.StubDecoder(16)
    assert(rows(1).features.toSeq === stub.decode("audio", "not audio at all".getBytes).toSeq)
    // video kind routes to the stub even when the payload IS decodable audio
    assert(rows(2).features.toSeq === stub.decode("video", wav).toSeq)
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
