package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns next to typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-local transforms.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernels are clearly-marked deterministic stubs ([[stubDecode]]) —
  * the Spark-side contract (schema, batching, partition locality, null
  * handling) is real and tested. Swap [[stubDecode]] for a JNI/FFmpeg/etc.
  * call and nothing else changes.
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

  /** STUB decode: a real implementation would hand `payload` to an image /
    * audio decoder. This deterministic stand-in "decodes" the payload into a
    * 16-bin byte-value histogram (so tests and downstream feature code have
    * real shapes to work with). Marked clearly as a stub per the build
    * contract. */
  def stubDecode(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    if (payload != null) {
      var i = 0
      while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    }
    hist
  }

  /** Feature extraction over the payload column: partition-local, no
    * shuffle; nulls yield null features. */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val decodeUdf = udf { (b: Array[Byte]) => if (b == null) null else stubDecode(b) }
    df.withColumn("features", decodeUdf(col(payloadCol)))
  }

  /** Byte-size + digest metadata without decoding (pure column expressions —
    * stays in codegen, pushdown-friendly). */
  def byteStats(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payloadCol)))
      .withColumn("digest", md5(col(payloadCol)))

  /** Frame sampling stub: every k-th fixed-size chunk of the payload — the
    * Spark-side shape of video frame extraction (a real impl would demux). */
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
