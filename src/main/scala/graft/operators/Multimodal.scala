package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-local transforms.
  *
  * Image decode is REAL (JDK `javax.imageio` — PNG/BMP/GIF, no native
  * codecs needed) and audio decode is REAL (RIFF/WAVE PCM-16 header +
  * sample parse, pure JDK). Only VIDEO demux remains a clearly-marked
  * deterministic stub ([[stubDecode]] / [[sampleFrames]]) — this
  * environment ships no container demuxer; swap the stub for an
  * FFmpeg/JNI call and nothing else changes.
  *
  * Scale notes: payload transforms are `mapPartitions`-shaped (no shuffle,
  * stream through each file split); metadata-only predicates (modality,
  * dimensions, byte size) are plain columns so partition pruning and
  * predicate pushdown still apply — filter BEFORE decoding, always.
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
    )), nullable = true),
  ))

  // ---------------------------------------------------------------- images

  /** Decoded-image summary: dimensions + exact per-channel pixel sums
    * (integers, so downstream comparisons need no float discipline). */
  final case class ImageFeatures(width: Int, height: Int,
                                 sumR: Long, sumG: Long, sumB: Long)

  /** REAL image decode via JDK ImageIO (PNG/BMP/GIF). Returns None for a
    * null/undecodable payload — corrupt media must degrade to a null row,
    * never kill the partition. */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] = {
    if (payload == null) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      if (img == null) return None // ImageIO signals "no decoder" with null
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y) // sRGB-packed, exact for 8-bit images
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      Some(ImageFeatures(img.getWidth, img.getHeight, sr, sg, sb))
    } catch { case _: Exception => None }
  }

  /** Deterministic synthetic PNG: pixel channel values are the pure integer
    * function `(id*7919 + p*257 + c*101) mod 256` of (media id, pixel index,
    * channel) — the SAME formula a SQL oracle can evaluate, so the ImageIO
    * encode→decode round-trip is verifiable end-to-end: if the real decoder
    * mangled a single pixel, the channel sums would hash-mismatch. */
  def syntheticPng(id: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < width * height) {
      val r = ((id * 7919 + p * 257) % 256).toInt
      val g = ((id * 7919 + p * 257 + 101) % 256).toInt
      val b = ((id * 7919 + p * 257 + 202) % 256).toInt
      img.setRGB(p % width, p / width, (r << 16) | (g << 8) | b)
      p += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image feature extraction: partition-local REAL decode; undecodable
    * payloads yield a null struct. */
  def imageFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (b: Array[Byte]) => decodeImage(b) }
    df.withColumn("img", dec(col(payloadCol)))
  }

  /** REAL image resize: decode, nearest-neighbor downsample to (dstW, dstH)
    * — dst pixel (x, y) samples src (x·srcW/dstW, y·srcH/dstH), integer
    * floor, the standard NN convention — then summarize the RESIZED pixels.
    * Materializes the resized BufferedImage (the thing a training pipeline
    * would re-encode and ship), not just a histogram fold. None on
    * null/undecodable payloads, like [[decodeImage]]. */
  def resizeImage(payload: Array[Byte], dstW: Int, dstH: Int): Option[ImageFeatures] = {
    require(dstW > 0 && dstH > 0)
    if (payload == null) return None
    try {
      val src = ImageIO.read(new ByteArrayInputStream(payload))
      if (src == null) return None
      val dst = new BufferedImage(dstW, dstH, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dstH) {
        var x = 0
        while (x < dstW) {
          dst.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, y * src.getHeight / dstH))
          x += 1
        }
        y += 1
      }
      var (sr, sg, sb) = (0L, 0L, 0L)
      y = 0
      while (y < dstH) {
        var x = 0
        while (x < dstW) {
          val rgb = dst.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      Some(ImageFeatures(dstW, dstH, sr, sg, sb))
    } catch { case _: Exception => None }
  }

  /** Resize feature extraction: partition-local decode + NN resize. */
  def imageResize(df: DataFrame, dstW: Int, dstH: Int,
                  payloadCol: String = "payload"): DataFrame = {
    val rz = udf { (b: Array[Byte]) => resizeImage(b, dstW, dstH) }
    df.withColumn("rimg", rz(col(payloadCol)))
  }

  // ----------------------------------------------------------------- audio

  /** Decoded-audio summary: PCM header fields + exact sample aggregates. */
  final case class WavFeatures(sampleRate: Int, channels: Int, nSamples: Int,
                               sumAmp: Long, maxAmp: Int)

  /** The ONE validated RIFF/WAVE PCM-16 walk everything derives from: chunk
    * list (fmt before data, skipping extension chunks), PCM/16-bit check,
    * little-endian sample extraction. Every read is bounds-checked and a
    * negative or overrunning declared chunk size aborts the walk (a crafted
    * size of -8 would otherwise advance the cursor by 0 and spin the
    * executor forever), with a defensive catch so corrupt media can NEVER
    * kill the partition. Returns (sampleRate, channels, samples). */
  private[operators] def parseWav(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload == null || payload.length < 44) return None
    try {
      def le16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
      def le32(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
      def tag(o: Int) = new String(payload, o, 4, "US-ASCII")
      if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var off = 12
      var fmt: Option[(Int, Int)] = None // (channels, sampleRate)
      while (off + 8 <= payload.length) {
        val id = tag(off); val sz = le32(off + 4)
        if (sz < 0 || off + 8 + sz > payload.length) return None // lying header
        if (id == "fmt ") {
          if (sz < 16) return None
          if (le16(off + 8) != 1 || le16(off + 22) != 16) return None // PCM s16 only
          fmt = Some((le16(off + 10), le32(off + 12)))
        } else if (id == "data") {
          val (ch, rate) = fmt.getOrElse(return None)
          if (ch <= 0) return None
          val samples = Array.tabulate(sz / 2)(i => le16(off + 8 + i * 2).toShort.toInt)
          return Some((rate, ch, samples))
        }
        off += 8 + sz + (sz & 1) // word-aligned; sz >= 0 checked, so off advances ≥ 8
      }
      None
    } catch { case _: Exception => None }
  }

  /** REAL WAV decode to exact sample aggregates — one [[parseWav]] walk.
    * None on null/corrupt/non-PCM16 payloads. */
  def decodeWav(payload: Array[Byte]): Option[WavFeatures] =
    parseWav(payload).map { case (rate, ch, samples) =>
      var (sum, max) = (0L, Int.MinValue)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        sum += s; if (s > max) max = s
        i += 1
      }
      WavFeatures(rate, ch, samples.length / ch, sum,
        if (samples.isEmpty) 0 else max)
    }

  /** Deterministic synthetic mono PCM-16 WAV: sample i is
    * `((id*131 + i*17) mod 65536) - 32768` — SQL-evaluable, so the real
    * header+sample parse is oracle-checkable like [[syntheticPng]]. */
  def syntheticWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataSz = nSamples * 2
    val out = new Array[Byte](44 + dataSz)
    def put(o: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, o) }
    def p16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def p32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    put(0, "RIFF"); p32(4, 36 + dataSz); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1) // PCM, mono
    p32(24, sampleRate); p32(28, sampleRate * 2); p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, dataSz)
    var i = 0
    while (i < nSamples) {
      p16(44 + i * 2, (((id * 131 + i * 17) % 65536) - 32768).toInt)
      i += 1
    }
    out
  }

  /** Audio feature extraction: partition-local REAL WAV parse; non-WAV
    * payloads yield a null struct. */
  def audioFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val dec = udf { (b: Array[Byte]) => decodeWav(b) }
    df.withColumn("wav", dec(col(payloadCol)))
  }

  // ----------------------------------------------------------------- video

  /** STUB decode — VIDEO ONLY. Images go through [[decodeImage]] (real
    * ImageIO) and audio through [[decodeWav]] (real PCM parse); container
    * demux has no JDK decoder, so this deterministic 16-bin byte-value
    * histogram stands in for per-frame features until an FFmpeg/JNI demuxer
    * is swapped in. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    }
    hist
  }

  /** Feature extraction over the payload column: partition-local, no
    * shuffle; nulls yield null features. Dispatches on the payload's magic
    * bytes: PNG → real ImageIO decode (16-bin red-channel histogram),
    * RIFF/WAVE → real PCM parse (16-bin amplitude histogram), anything else
    * (video containers, opaque bytes) → the documented [[stubDecode]]. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val decodeUdf = udf { (b: Array[Byte]) =>
      if (b == null) null else dispatchDecode(b)
    }
    df.withColumn("features", decodeUdf(col(payloadCol)))
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  private def startsWith(b: Array[Byte], m: Array[Byte]): Boolean =
    b.length >= m.length && m.indices.forall(i => b(i) == m(i))

  private[operators] def dispatchDecode(b: Array[Byte]): Array[Double] =
    if (startsWith(b, PngMagic)) {
      // ONE real decode, histogram built in the same pixel pass (an earlier
      // version decoded twice — once for validation, once for the histogram)
      try {
        val img = ImageIO.read(new ByteArrayInputStream(b))
        if (img == null) null
        else {
          val hist = new Array[Double](16)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              hist(((img.getRGB(x, y) >> 16) & 0xff) >> 4) += 1.0; x += 1
            }
            y += 1
          }
          hist
        }
      } catch { case _: Exception => null }
    } else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      // ONE validated sample walk; RIFF-but-not-PCM16-WAVE (AVI containers,
      // text that happens to start with "RIFF") falls through to the stub —
      // the documented video-container path, not a silent null
      parseWav(b) match {
        case Some((_, _, samples)) =>
          val hist = new Array[Double](16)
          samples.foreach(s => hist((s + 32768) >> 12) += 1.0)
          hist
        case None => stubDecode(b)
      }
    } else stubDecode(b)

  /** Raw sample values of a validated PCM-16 WAV (helper for tests). */
  private[operators] def decodeWavSamples(payload: Array[Byte]): Array[Int] =
    parseWav(payload).map(_._3).getOrElse(Array.empty)

  /** Byte-size + digest metadata without decoding (pure column expressions —
    * stays in codegen, pushdown-friendly). */
  def byteStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("digest", md5(col(payloadCol)))

  /** Frame sampling stub: every k-th fixed-size chunk of the payload — the
    * Spark-side shape of video frame extraction (a real impl would demux;
    * see [[stubDecode]]'s video caveat). */
  def sampleFrames(df: DataFrame, frameBytes: Int, everyK: Int,
                   payloadCol: String = "payload"): DataFrame = {
    require(frameBytes > 0 && everyK > 0)
    val sampler = udf { (b: Array[Byte]) =>
      if (b == null) Array.empty[Array[Byte]]
      else b.grouped(frameBytes).grouped(everyK).map(_.head).toArray
    }
    df.withColumn("frames", sampler(col(payloadCol)))
      .withColumn("n_frames_sampled", size(col("frames")))
  }

  /** Resize stub: real impl rescales decoded pixels; the stub folds the byte
    * histogram down to `bins` (shape-preserving contract). */
  def resizeFeatures(df: DataFrame, bins: Int): DataFrame = {
    require(bins > 0 && 16 % bins == 0, "bins must divide 16")
    val fold = udf { (f: scala.collection.Seq[Double]) =>
      if (f == null) null
      else f.grouped(16 / bins).map(_.sum).toArray
    }
    df.withColumn("features", fold(col("features")))
  }
}
