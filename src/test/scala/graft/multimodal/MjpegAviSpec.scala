package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.Multimodal._
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.{ByteBuffer, ByteOrder}

/** The video path end-to-end: build a genuine MJPEG AVI (RIFF container,
  * JPEG-compressed frames via ImageIO), parse it back, frame-sample, and
  * check the luminance features track the frames' actual brightness.
  */
class MjpegAviSpec extends SparkTestBase {

  private def jpegFrame(gray: Int, size: Int = 16): Array[Byte] = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until size; x <- 0 until size) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal but structurally honest MJPEG AVI: RIFF('AVI ') containing a
    * LIST('hdrl') with an avih header and a LIST('movi') of 00dc frames. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val bb = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes(US_ASCII)).putInt(body.length).put(body)
      bb.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("LIST".getBytes(US_ASCII)).putInt(4 + body.length)
        .put(kind.getBytes(US_ASCII)).put(body)
      bb.array()
    }
    val avih = {
      val bb = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(66666) // µs per frame (15 fps)
        .putInt(0).putInt(0).putInt(0x10) // flags: AVIF_HASINDEX off, interleaved
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(16).putInt(16) // width, height
      bb.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val payload = hdrl ++ movi
    val bb = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(4 + payload.length)
      .put("AVI ".getBytes(US_ASCII)).put(payload)
    bb.array()
  }

  test("parses its own RIFF structure back to the exact frame payloads") {
    val frames = Seq(jpegFrame(30), jpegFrame(200), jpegFrame(121)) // odd-length safe
    val dec = new MjpegAviDecoder(grid = 2, frameStep = 1)
    val parsed = dec.parseFrames(mjpegAvi(frames))
    assert(parsed.length === 3)
    parsed.zip(frames).foreach { case (p, f) => assert(p.toSeq === f.toSeq) }
  }

  test("features track real frame luminance; frameStep samples frames") {
    val dark = jpegFrame(20)
    val bright = jpegFrame(230)
    val all = new MjpegAviDecoder(grid = 2, frameStep = 1)
      .decode("video", mjpegAvi(Seq(dark, bright)))
    // mean of dark (~0.08) and bright (~0.9) frames: mid-gray
    assert(all.forall(v => v > 0.3f && v < 0.7f), all.toSeq.toString)
    val sampled = new MjpegAviDecoder(grid = 2, frameStep = 2)
      .decode("video", mjpegAvi(Seq(dark, bright)))
    // step 2 keeps only frame 0 (dark)
    assert(sampled.forall(_ < 0.2f), sampled.toSeq.toString)
  }

  test("non-AVI and corrupt payloads fall back to byte-window features") {
    val dec = new MjpegAviDecoder(grid = 2)
    val stub = new StubDecoder(4)
    val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    assert(dec.decode("video", junk).toSeq === stub.decode("video", junk).toSeq)
    // truncated AVI: valid magic, corrupt chunk size — parses cleanly to Nil
    val avi = mjpegAvi(Seq(jpegFrame(99)))
    val broken = avi.take(20) ++ Array.fill[Byte](8)(-1)
    assert(dec.decode("video", broken).toSeq === stub.decode("video", broken).toSeq)
  }

  test("CompositeDecoder routes a mixed media table through all real codecs") {
    import spark.implicits._
    val avi = mjpegAvi(Seq(jpegFrame(230), jpegFrame(230)))
    val rows = Seq(
      MediaRow(1L, "video", avi, Map("codec" -> "mjpeg")),
      MediaRow(2L, "other", Array.tabulate[Byte](32)(_.toByte), Map.empty))
    val feats = extractFeatures(rows.toDF(), () => new CompositeDecoder(grid = 2))
      .collect().map(r => r.media_id -> r.features).toMap
    assert(feats(1L).forall(_ > 0.7f)) // bright video decoded via ImageIO
    assert(feats(1L).length === 4 && feats(2L).length === 4)
  }
}
