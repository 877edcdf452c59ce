package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata; decode/feature-extraction runs per partition in
  * batches (the Scala analogue of `mapInPandas` batch processing).
  *
  * The IMAGE codec is real: [[ImageIoDecoder]] decodes PNG/BMP/GIF/JPEG
  * through the JDK's built-in `javax.imageio` (no external library) into
  * pixel-derived grid-luminance features. The AUDIO codec is real too:
  * [[AudioDecoder]] decodes WAV/AIFF/AU through `javax.sound.sampled`
  * into per-segment PCM RMS energy. VIDEO is real for MJPEG-in-AVI:
  * [[MjpegAviDecoder]] walks the RIFF container and frame-samples the
  * JPEG payloads through the same ImageIO codec; compressed codecs the
  * JDK lacks (H.264 etc.) fall back to [[StubDecoder]] byte-window
  * features, clearly marked. The Spark-side contract — schema, batch
  * iteration, partition-local decoder reuse, feature array shape — is
  * the same on every path.
  */
object Multimodal {

  /** (media_id, kind, content BINARY, meta MAP) — the storage schema.
    * Binary stays opaque through shuffles; metadata is columnar. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Decoder contract: bytes → fixed-dim feature vector. Implementations
    * are constructed once per partition (expensive codec init amortized
    * over the partition, never serialized per row). */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(kind: String, bytes: Array[Byte]): Array[Float]
  }

  /** Deterministic fake decode: byte-windowed means — stands in for the
    * real image/audio codec (marked stub; swap for a JNI/codec-backed
    * implementation on a real cluster). */
  class StubDecoder(val dim: Int = 16) extends Decoder {
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes.nonEmpty) {
        val stride = math.max(1, bytes.length / dim)
        var i = 0
        while (i < dim) {
          var s = 0
          var j = i * stride
          val end = math.min(bytes.length, j + stride)
          while (j < end) { s += bytes(j) & 0xff; j += 1 }
          out(i) = s.toFloat / math.max(1, end - i * stride)
          i += 1
        }
      }
      out
    }
  }

  /** Real image decode via the JDK's built-in ImageIO (PNG/BMP/GIF/JPEG
    * — zero external dependencies): features are the g×g mean-luminance
    * grid of the decoded pixels, each cell normalized to [0,1]. Non-image
    * kinds (audio/video — the JDK ships no codec) and undecodable
    * payloads fall back to [[StubDecoder]]'s byte-window features, so a
    * mixed-kind table streams through one decoder. ImageIO readers are
    * not thread-safe; instances are built once per partition (the
    * [[extractFeatures]] contract), never shared.
    */
  class ImageIoDecoder(grid: Int = 4) extends Decoder {
    val dim: Int = grid * grid
    private val fallback = new StubDecoder(dim)
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "image" || bytes == null || bytes.isEmpty)
        return fallback.decode(kind, bytes)
      val f = decodeOrNull(bytes)
      if (f == null) fallback.decode(kind, bytes) else f // not an image ImageIO knows
    }
    /** Grid-luminance features, or null when ImageIO has no codec for the
      * payload (callers choose their own fallback — the video path skips
      * undecodable frames instead of averaging stub bytes in). */
    private[multimodal] def decodeOrNull(bytes: Array[Byte]): Array[Float] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: java.io.IOException => null }
      if (img == null) return null
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](dim)
      val cnt = new Array[Int](dim)
      var y = 0
      while (y < h) {
        val gy = math.min(grid - 1, y * grid / h)
        var x = 0
        while (x < w) {
          val gx = math.min(grid - 1, x * grid / w)
          val rgb = img.getRGB(x, y)
          val lum = (0.299f * ((rgb >> 16) & 0xff) + 0.587f * ((rgb >> 8) & 0xff) +
            0.114f * (rgb & 0xff)) / 255f
          out(gy * grid + gx) += lum
          cnt(gy * grid + gx) += 1
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < dim) { if (cnt(i) > 0) out(i) /= cnt(i); i += 1 }
      out
    }
  }

  /** Real audio decode via the JDK's built-in `javax.sound.sampled`
    * (WAV/AIFF/AU — zero external dependencies): payload → PCM samples
    * (converted to 16-bit signed if stored otherwise, channels averaged)
    * → per-segment RMS energy over `dim` equal time slices, each in
    * [0,1]. The frame-derived analogue of [[ImageIoDecoder]]'s
    * grid-luminance. Non-audio kinds and undecodable payloads fall back
    * to [[StubDecoder]] byte-window features, same contract as the image
    * path. AudioInputStreams are stateful; one decoder per partition. */
  class AudioDecoder(val dim: Int = 16) extends Decoder {
    private val fallback = new StubDecoder(dim)
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      import javax.sound.sampled._
      if (kind != "audio" || bytes == null || bytes.isEmpty)
        return fallback.decode(kind, bytes)
      val samples: Array[Float] =
        try {
          val raw = AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val f = raw.getFormat
          val pcm16 = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels,
            2 * f.getChannels, f.getSampleRate, false)
          val ais =
            if (f.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16 && !f.isBigEndian) raw
            else AudioSystem.getAudioInputStream(pcm16, raw)
          val data = ais.readAllBytes()
          val ch = ais.getFormat.getChannels
          val n = data.length / (2 * ch)
          Array.tabulate(n) { i =>
            var s = 0f
            var c = 0
            while (c < ch) {
              val o = (i * ch + c) * 2
              s += (((data(o) & 0xff) | (data(o + 1) << 8)).toShort / 32768f)
              c += 1
            }
            s / ch
          }
        } catch {
          case _: UnsupportedAudioFileException | _: java.io.IOException |
               _: IllegalArgumentException => null
        }
      if (samples == null || samples.isEmpty) return fallback.decode(kind, bytes)
      val out = new Array[Float](dim)
      val seg = math.max(1, samples.length / dim)
      var i = 0
      while (i < dim) {
        var sq = 0.0
        var j = i * seg
        val end = math.min(samples.length, j + seg)
        while (j < end) { sq += samples(j) * samples(j); j += 1 }
        out(i) = math.sqrt(sq / math.max(1, end - i * seg)).toFloat
        i += 1
      }
      out
    }
  }

  /** Real VIDEO decode for MJPEG-in-AVI — the one video format the bare
    * JDK can genuinely decode, because an MJPEG stream is just JPEG frames
    * in a RIFF container and `javax.imageio` ships a JPEG codec. The
    * parser walks the RIFF chunk tree (`RIFF('AVI ')` → `LIST` recursion,
    * word-aligned chunks), collects the `00dc`/`00db` movi payloads, and
    * FRAME-SAMPLES every `frameStep`-th frame through
    * [[ImageIoDecoder]]'s grid-luminance, averaging the sampled frames —
    * decode cost scales with frames/step, the standard video
    * feature-extraction shape. Non-AVI payloads and codecs the JDK lacks
    * (H.264 etc.) fall back to [[StubDecoder]] byte-window features, same
    * contract as the image/audio paths. */
  class MjpegAviDecoder(grid: Int = 4, frameStep: Int = 2) extends Decoder {
    require(frameStep > 0)
    val dim: Int = grid * grid
    private val image = new ImageIoDecoder(grid)
    private val fallback = new StubDecoder(dim)
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = {
      if (kind != "video" || bytes == null || bytes.length < 12)
        return fallback.decode(kind, bytes)
      val frames = parseFrames(bytes)
      // sample every frameStep-th frame; skip frames ImageIO cannot decode
      // (a corrupt frame must not poison the average)
      val feats = frames.indices
        .collect { case i if i % frameStep == 0 => image.decodeOrNull(frames(i)) }
        .filter(_ != null)
      if (feats.isEmpty) return fallback.decode(kind, bytes)
      val out = new Array[Float](dim)
      feats.foreach { f => var i = 0; while (i < dim) { out(i) += f(i); i += 1 } }
      var i = 0
      while (i < dim) { out(i) /= feats.size; i += 1 }
      out
    }
    /** `00dc`/`00db` chunk payloads in stream order; Nil if not an AVI. */
    private[multimodal] def parseFrames(b: Array[Byte]): Seq[Array[Byte]] = {
      def fourcc(o: Int): String =
        if (o + 4 <= b.length)
          new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        else ""
      def u32(o: Int): Long =
        (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
      val out = Seq.newBuilder[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          val id = fourcc(o)
          val sz = u32(o + 4)
          if (sz < 0 || sz > end - o - 8) return // corrupt size: stop cleanly
          val szi = sz.toInt
          if (id == "LIST") walk(o + 12, o + 8 + szi)
          else if ((id == "00dc" || id == "00db") && szi > 0)
            out += java.util.Arrays.copyOfRange(b, o + 8, o + 8 + szi)
          o += 8 + szi + (szi & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, math.min(b.length, (u32(4) + 8).toInt))
      out.result()
    }
  }

  /** Kind-dispatching decoder: image → ImageIO pixels, audio → sampled
    * PCM RMS, video → MJPEG-AVI frame sampling (all three REAL JDK
    * codecs); unknown kinds and payloads no JDK codec can read →
    * byte-window features. All paths share `dim`, so a mixed-kind table
    * yields one uniform feature column. */
  class CompositeDecoder(grid: Int = 4) extends Decoder {
    val dim: Int = grid * grid
    private val image = new ImageIoDecoder(grid)
    private val audio = new AudioDecoder(dim)
    private val video = new MjpegAviDecoder(grid)
    private val stub = new StubDecoder(dim)
    def decode(kind: String, bytes: Array[Byte]): Array[Float] = kind match {
      case "image" => image.decode(kind, bytes)
      case "audio" => audio.decode(kind, bytes)
      case "video" => video.decode(kind, bytes)
      case _ => stub.decode(kind, bytes)
    }
  }

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      meta: Map[String, String])
  case class FeatureRow(media_id: Long, kind: String, features: Array[Float])

  /** Feature extraction: batched per-partition decode. One decoder per
    * partition; rows stream through without materializing the partition. */
  def extractFeatures(media: DataFrame, mkDecoder: () => Decoder): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      val dec = mkDecoder()
      it.map(r => FeatureRow(r.media_id, r.kind, dec.decode(r.kind, r.content)))
    }
  }

  /** Frame/chunk sampling: split the binary payload into fixed-size chunks
    * and keep every k-th — pure column expressions (substr on binary). */
  def sampleChunks(media: DataFrame, chunkBytes: Int, everyK: Int): DataFrame =
    media
      .withColumn("n_chunks",
        ceil(octet_length(col("content")).cast("double") / chunkBytes).cast("int"))
      .filter(col("n_chunks") > 0) // empty payload -> zero chunk rows
      .withColumn("chunk_idx",
        explode(filter(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0))),
          i => i % everyK === 0)))
      .withColumn("chunk",
        expr(s"substring(content, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .select(col("media_id"), col("kind"), col("chunk_idx"), col("chunk"))

  /** "Resize" stub: deterministic stride subsample of the payload to ≤
    * targetBytes — the codec-free stand-in for image resize / audio
    * downsample (real plumbing: binary in, smaller binary out, metadata
    * updated; swap the byte math for a codec call on a real cluster).
    * Runs per partition like [[extractFeatures]] — one "codec" per
    * partition, rows streamed. */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val in = if (r.content == null) Array.empty[Byte] else r.content
        val out = if (in.length <= targetBytes) in
        else {
          val stride = in.length.toDouble / targetBytes
          Array.tabulate(targetBytes)(i => in((i * stride).toInt))
        }
        MediaRow(r.media_id, r.kind, out,
          (if (r.meta == null) Map.empty[String, String] else r.meta) +
            ("orig_bytes" -> in.length.toString))
      }
    }.toDF()
  }

  /** Wrap text rows into the media schema (test/fixture helper). */
  def textAsMedia(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id).cast("long").as("media_id"), lit("text").as("kind"),
      col(text).cast("binary").as("content"),
      map(lit("n_chars"), length(col(text)).cast("string")).as("meta"))
}
