package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantic dedup (dedup_embedding_lsh_stream): the stateful
  * band-bucket pipeline must equal the batch sign-LSH pipeline on the
  * same corpus, and a two-batch split must equal the one-batch run — the
  * state carries bucket membership across micro-batches, so pairs
  * STRADDLING the batch boundary are found exactly once. Mirror of
  * DedupStreamSpec for the embedding family. */
class EmbStreamSpec extends SparkSpec {

  private val Dim = 64
  private val NBits = 64 // bitsPerBand(40) = 8 → 8 bands × 8 bits
  private val Bands = 8

  /** 40 vectors; odd i is a near-dup of i−1 (tiny deterministic jitter),
    * even-base directions are hash-derived (near-orthogonal in 64-d). */
  private def corpus: Seq[(Long, Array[Double])] = {
    def h(a: Long, d: Int): Double = {
      val x = (a * 2654435761L + d * 40503L) & 0xffffL
      x.toDouble / 0xffff.toDouble - 0.5
    }
    (0L until 40L).map { i =>
      val base = i / 2 * 2
      val v = Array.tabulate(Dim)(d => h(base, d))
      if (i % 2 == 1) (i, v.zipWithIndex.map { case (x, d) => x + h(i, d) * 0.01 })
      else (i, v)
    }
  }

  private def batchPairs: Set[(Long, Long, Double)] = {
    import spark.implicits._
    val pts = corpus.toDF("vec_id", "v")
    Similarity.lshNearDupPairs(pts, EmbStream.MinCos, NBits, Bands)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def runStream(batches: Seq[Seq[(Long, Array[Double])]]): Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double])]
    val bands = EmbStream.bandRows(mem.toDF().toDF("vec_id", "v"), NBits, Bands)
      .as[EmbStream.BandVec]
    val q = EmbStream.pairsStream(bands).toDF()
      .writeStream.format("memory").queryName("emb_pairs_mem")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("emb_pairs_mem").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS emb_pairs_mem")
    }
  }

  test("one-batch stream == two-batch stream == batch LSH pipeline") {
    val batch = batchPairs
    assert(batch.nonEmpty, "fixture must contain confirmed pairs")
    assert(batch.exists { case (a, b, _) => a <= 20 && b >= 21 },
      "fixture must have a pair straddling the split point")
    val oneShot = runStream(Seq(corpus))
    assert(oneShot == batch, "one-batch stream must equal the batch pipeline")
    // split between 20 and 21: the planted pair (20, 21) straddles it
    val (b1, b2) = corpus.splitAt(21)
    val twoShot = runStream(Seq(b1, b2))
    assert(twoShot == batch, "a batch split must be result-invisible")
  }

  test("restart between days: checkpointed bucket state survives, pairs exactly once") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("emb_stream_restart")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val (day1, day2) = corpus.splitAt(21)
    def runDay(batch: Seq[(Long, Array[Double])]): Unit = {
      batch.toDF("vec_id", "v").write.mode("append").parquet(inDir)
      val stream = spark.readStream
        .schema("vec_id LONG, v ARRAY<DOUBLE>").parquet(inDir)
      val q = EmbStream.pairsStream(
          EmbStream.bandRows(stream, NBits, Bands).as[EmbStream.BandVec])
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runDay(day1)
    runDay(day2)
    val got = spark.read.schema("vec_a LONG, vec_b LONG, cos_sim DOUBLE")
      .parquet(outDir)
    val batch = batchPairs
    val streamed = got.distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "restart seam must be result-invisible")
    val keyCounts = got.distinct().groupBy(col("vec_a"), col("vec_b")).count()
      .where(col("count") > 1).count()
    assert(keyCounts == 0, "no pair may carry two different cosines")
    assert(batch.exists { case (a, b, _) => a < 21 && b >= 21 },
      "fixture must contain cross-day pairs (state was load-bearing)")
  }

  test("per-row streaming band keys equal the batch lshSignBands keys") {
    import spark.implicits._
    val pts = corpus.toDF("vec_id", "v")
    val batchKeys = Similarity.lshSignBands(pts, NBits, Bands)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val streamKeys = EmbStream.bandRows(pts, NBits, Bands)
      .select(col("vec_id"), col("band"), col("key"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamKeys == batchKeys, "band keys must be bit-identical")
  }
}
