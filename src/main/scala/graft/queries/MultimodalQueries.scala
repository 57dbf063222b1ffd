package graft.queries

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal catalog entries. The testdata ships no real media table, so the
  * binary columns are manufactured deterministically: byte-stats/frame
  * entries use ASCII-filtered text cast to bytes, and the DECODE entries
  * build REAL PNG / RIFF-WAVE payloads whose pixels/samples are a pure
  * integer function of the media id ([[Multimodal.syntheticPng]] /
  * [[Multimodal.syntheticWav]]). That makes the real JDK decoders
  * (ImageIO, PCM-16 parse) oracle-checkable end-to-end: DuckDB evaluates
  * the same integer formula, so one mangled pixel or sample in the decode
  * path hash-mismatches.
  */
object MultimodalQueries {

  private val PngW = 16
  private val PngH = 16
  private val WavSamples = 480
  private val WavRate = 8000

  /** REAL image decode under the oracle: synthesize a PNG per document id,
    * decode it with ImageIO, emit dimensions + exact per-channel sums.
    * Partition-local (no shuffle); the scan reads only doc_id. */
  def mmImageDecode(s: SparkSession, dir: String): DataFrame = {
    val makePng = udf { (id: Long) => Multimodal.syntheticPng(id, PngW, PngH) }
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"))
      .withColumn("payload", makePng(col("media_id")))
    Multimodal.imageFeatures(media)
      .select(col("media_id"),
        col("img.width").as("width"), col("img.height").as("height"),
        col("img.sumR").as("sum_r"), col("img.sumG").as("sum_g"),
        col("img.sumB").as("sum_b"))
  }

  /** REAL WAV decode under the oracle: synthesize a PCM-16 WAV per document
    * id, parse header + samples, emit rate/counts + exact sample aggregates. */
  def mmAudioDecode(s: SparkSession, dir: String): DataFrame = {
    val makeWav = udf { (id: Long) => Multimodal.syntheticWav(id, WavSamples, WavRate) }
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"))
      .withColumn("payload", makeWav(col("media_id")))
    Multimodal.audioFeatures(media)
      .select(col("media_id"),
        col("wav.sampleRate").as("sample_rate"),
        col("wav.nSamples").as("n_samples"),
        col("wav.sumAmp").as("sum_amp"),
        col("wav.maxAmp").as("max_amp"))
  }

  /** REAL decode → resize under the oracle: synthesize a 16×16 PNG, decode,
    * nearest-neighbor downsample to 8×8 (dst (x,y) samples src (2x, 2y)),
    * emit the RESIZED image's channel sums. The oracle evaluates the
    * synthetic-pixel formula on exactly the sampled source offsets — a
    * one-pixel-off resize (center-sampling, rounding, transposed axes)
    * hash-mismatches. */
  def mmImageResize(s: SparkSession, dir: String): DataFrame = {
    val makePng = udf { (id: Long) => Multimodal.syntheticPng(id, PngW, PngH) }
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"))
      .withColumn("payload", makePng(col("media_id")))
    Multimodal.imageResize(media, PngW / 2, PngH / 2)
      .select(col("media_id"),
        col("rimg.width").as("width"), col("rimg.height").as("height"),
        col("rimg.sumR").as("sum_r"), col("rimg.sumG").as("sum_g"),
        col("rimg.sumB").as("sum_b"))
  }

  /** Byte-level metadata over a binary payload column: size + digest +
    * a 4-bucket shard key. Pure column expressions, no decode. */
  def mmByteStats(s: SparkSession, dir: String): DataFrame = {
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("payload"))
    Multimodal.byteStats(media)
      .select(col("media_id"), col("n_bytes").cast("int").as("n_bytes"), col("digest"),
        (col("media_id") % 4).as("shard"))
  }

  /** Decoded-feature aggregate: stub-decode the payload into a 16-bin
    * byte-value histogram, aggregate per bin. Payload is ASCII-filtered so
    * the DuckDB oracle's codepoint histogram equals the byte histogram —
    * exact integer arithmetic in both engines. */
  def mmFeatureAgg(s: SparkSession, dir: String): DataFrame = {
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "").cast("binary").as("payload"))
    Multimodal.extractFeatures(media)
      .select(col("media_id"), posexplode(col("features")).as(Seq("bin", "cnt")))
      .where(col("cnt") > 0)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_media"), sum(col("cnt")).cast("long").as("total"))
  }

  /** Frame sampling over the payload: every 2nd 64-byte chunk (the Spark-side
    * shape of video frame extraction — a real impl would demux instead of
    * chunking). ASCII-filtered payload keeps the first-frame digest
    * oracle-checkable (1 byte per char, so VARCHAR substr == byte slice). */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        regexp_replace(col("text"), "[^\\x00-\\x7F]", "").cast("binary").as("payload"))
    Multimodal.sampleFrames(media, frameBytes = 64, everyK = 2)
      .select(col("media_id"), col("n_frames_sampled"),
        when(size(col("frames")) > 0, md5(element_at(col("frames"), 1)))
          .as("first_frame_digest"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_byte_stats" -> mmByteStats _,
    "mm_feature_agg" -> mmFeatureAgg _,
    "mm_frame_sample" -> mmFrameSample _,
    "mm_image_decode" -> mmImageDecode _,
    "mm_image_resize" -> mmImageResize _,
    "mm_audio_decode" -> mmAudioDecode _,
  )

  val oracleSql: Map[String, String] = Map(
    "mm_byte_stats" ->
      """SELECT doc_id AS media_id,
        | CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        | md5(text) AS digest,
        | doc_id % 4 AS shard
        |FROM documents""".stripMargin,
    "mm_feature_agg" ->
      """WITH cleaned AS (
        |  SELECT doc_id AS media_id,
        |    regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS clean
        |  FROM documents),
        |chars AS (
        |  SELECT media_id, ascii(substr(clean, CAST(i AS INT), 1)) // 16 AS bin
        |  FROM (SELECT media_id, clean, unnest(range(1, len(clean) + 1)) AS i
        |        FROM cleaned)),
        |per_media AS (
        |  SELECT media_id, bin, count(*) AS cnt FROM chars GROUP BY 1, 2)
        |SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(sum(cnt) AS BIGINT) AS total
        |FROM per_media GROUP BY 1""".stripMargin,
    "mm_frame_sample" ->
      """WITH cleaned AS (
        |  SELECT doc_id AS media_id,
        |    regexp_replace(text, '[^\x00-\x7F]', '', 'g') AS clean
        |  FROM documents)
        |SELECT media_id,
        |  CAST(CASE WHEN len(clean) = 0 THEN 0
        |       ELSE ((len(clean) + 63) // 64 + 1) // 2 END AS INT) AS n_frames_sampled,
        |  CASE WHEN len(clean) = 0 THEN NULL
        |       ELSE md5(substr(clean, 1, 64)) END AS first_frame_digest
        |FROM cleaned""".stripMargin,
    // the decoded-pixel formula of Multimodal.syntheticPng — one mangled
    // pixel in the ImageIO round-trip breaks the channel-sum hash
    "mm_image_decode" ->
      s"""WITH px AS (
         |  SELECT doc_id AS media_id, unnest(range(0, ${PngW * PngH})) AS p
         |  FROM documents)
         |SELECT media_id, $PngW AS width, $PngH AS height,
         |  CAST(sum((media_id * 7919 + p * 257) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((media_id * 7919 + p * 257 + 101) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((media_id * 7919 + p * 257 + 202) % 256) AS BIGINT) AS sum_b
         |FROM px GROUP BY 1""".stripMargin,
    // NN resize sampling map: dst q (0..dstW·dstH-1) → src p =
    // (2·(q div dstW))·srcW + 2·(q mod dstW); sums evaluate the synthetic
    // formula at exactly those source offsets
    "mm_image_resize" -> {
      val (dw, dh) = (PngW / 2, PngH / 2)
      s"""WITH px AS (
         |  SELECT doc_id AS media_id, unnest(range(0, ${dw * dh})) AS q
         |  FROM documents),
         |mapped AS (
         |  SELECT media_id, (q // $dw * 2) * $PngW + (q % $dw) * 2 AS p FROM px)
         |SELECT media_id, $dw AS width, $dh AS height,
         |  CAST(sum((media_id * 7919 + p * 257) % 256) AS BIGINT) AS sum_r,
         |  CAST(sum((media_id * 7919 + p * 257 + 101) % 256) AS BIGINT) AS sum_g,
         |  CAST(sum((media_id * 7919 + p * 257 + 202) % 256) AS BIGINT) AS sum_b
         |FROM mapped GROUP BY 1""".stripMargin
    },
    // the sample formula of Multimodal.syntheticWav — validates the PCM
    // header walk AND every little-endian 16-bit sample
    "mm_audio_decode" ->
      s"""WITH smp AS (
         |  SELECT doc_id AS media_id,
         |    ((doc_id * 131 + unnest(range(0, $WavSamples)) * 17) % 65536) - 32768 AS s
         |  FROM documents)
         |SELECT media_id, $WavRate AS sample_rate, $WavSamples AS n_samples,
         |  CAST(sum(s) AS BIGINT) AS sum_amp, CAST(max(s) AS INT) AS max_amp
         |FROM smp GROUP BY 1""".stripMargin,
  )
}
