package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    val rows = Seq(
      Row(0L, "image", Array.tabulate[Byte](256)(_.toByte), Row(16, 16, null, null)),
      Row(1L, "audio", Array.fill[Byte](1000)(65), Row(null, null, 44100, null)),
      Row(2L, "video", Array.tabulate[Byte](4096)(i => (i % 251).toByte), Row(64, 64, null, 100)),
      Row(3L, "image", null, Row(null, null, null, null)),
    )
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), Multimodal.schema)
  }

  test("schema carries binary payload + typed metadata") {
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    assert(media.where(col("meta.sample_rate") === 44100).count() == 1)
  }

  test("stub decode: 16-bin byte histogram, total == payload length") {
    val f = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Seq[Double]]("features"))).toMap
    assert(f(0L).get.sum == 256.0)
    assert(f(0L).get.forall(_ == 16.0)) // uniform byte values -> uniform histogram
    assert(f(1L).get(4) == 1000.0)      // 'A' = 0x41 -> bin 4
    assert(f(3L).isEmpty)               // null payload -> null features
  }

  test("byteStats computes size and digest without decoding") {
    val out = Multimodal.byteStats(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("n_bytes") == 1000)
    assert(out(3L).isNullAt(out(3L).fieldIndex("n_bytes")))
    assert(out(0L).getAs[String]("digest").length == 32)
  }

  test("frame sampling: every k-th fixed-size chunk") {
    val out = Multimodal.sampleFrames(media, frameBytes = 256, everyK = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("n_frames_sampled")).toMap
    assert(out(2L) == 4)   // 4096/256 = 16 chunks, every 4th -> 4
    assert(out(0L) == 1)
    assert(out(3L) == 0)   // null payload -> no frames
  }

  test("resize folds histogram bins shape-preservingly") {
    val out = Multimodal.resizeFeatures(Multimodal.extractFeatures(media), bins = 4)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[scala.collection.Seq[Double]]("features"))).toMap
    assert(out(0L).get.length == 4)
    assert(out(0L).get.sum == 256.0)
  }
}
