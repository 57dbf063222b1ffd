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

  // ---- horizon-eviction mode (r10 verdict #6) ----

  private val HourMs = 3600L * 1000L

  /** Planted timeline: a near-dup pair (0,1) plus filler at t=0; two hours
    * later a near-dup of 0 (id 100, CROSS-horizon) and a fresh within-
    * horizon pair (110,111); a lone late row advances the watermark past
    * the t=0 buckets' timeout. Horizon = 1 h. */
  private def timedCorpus: Seq[Seq[(Long, Array[Double], java.sql.Timestamp)]] = {
    def h(a: Long, d: Int): Double = {
      val x = (a * 2654435761L + d * 40503L) & 0xffffL
      x.toDouble / 0xffff.toDouble - 0.5
    }
    def vec(base: Long): Array[Double] = Array.tabulate(Dim)(d => h(base, d))
    def jitter(base: Long, salt: Long): Array[Double] =
      vec(base).zipWithIndex.map { case (x, d) => x + h(salt, d) * 0.01 }
    // +1 day: a row AT the initial watermark (epoch 0) is dropped as late
    def ts(sec: Long) = new java.sql.Timestamp((86400L + sec) * 1000L)
    val t0: Seq[(Long, Array[Double], java.sql.Timestamp)] =
      Seq((0L, vec(0), ts(0)), (1L, jitter(0, 1), ts(0))) ++
        (2L to 5L).map(i => (i, vec(i * 2), ts(0)))
    val t2h: Seq[(Long, Array[Double], java.sql.Timestamp)] = Seq(
      (100L, jitter(0, 100), ts(7200)), // near-dup of 0, two horizons late
      (110L, vec(55), ts(7200)), (111L, jitter(55, 111), ts(7200)))
    val late: Seq[(Long, Array[Double], java.sql.Timestamp)] =
      Seq((200L, vec(77), ts(7201)))
    Seq(t0, t2h, late)
  }

  private def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators).lastOption.map(_.numRowsTotal)
      .getOrElse(sys.error("no state operator progress recorded"))

  test("horizon mode: cross-horizon dups suppressed, state evicted, within-horizon exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference run: NoTimeout path on the same rows (event time ignored)
    val memN = MemoryStream[(Long, Array[Double])]
    val qN = EmbStream.pairsStream(
        EmbStream.bandRows(memN.toDF().toDF("vec_id", "v"), NBits, Bands)
          .as[EmbStream.BandVec]).toDF()
      .writeStream.format("memory").queryName("emb_noevict")
      .outputMode("append").start()
    val (noEvictPairs, noEvictState) = try {
      timedCorpus.foreach { b =>
        memN.addData(b.map(r => (r._1, r._2)): _*); qN.processAllAvailable()
      }
      (spark.table("emb_noevict").select("vec_a", "vec_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        lastStateRows(qN))
    } finally { qN.stop(); spark.sql("DROP TABLE IF EXISTS emb_noevict") }
    assert(noEvictPairs.contains((0L, 100L)),
      "fixture: without a horizon the stale near-dup must be found (collision is real)")
    assert(noEvictPairs.contains((0L, 1L)) && noEvictPairs.contains((110L, 111L)))

    // horizon run: 1 h horizon, zero watermark delay (event times ordered)
    val memE = MemoryStream[(Long, Array[Double], java.sql.Timestamp)]
    val qE = EmbStream.pairsStreamEvicting(
        EmbStream.bandRowsT(memE.toDF().toDF("vec_id", "v", "ts"), NBits, Bands)
          .as[EmbStream.BandVecT],
        horizonMs = HourMs, watermarkDelay = "0 seconds").toDF()
      .writeStream.format("memory").queryName("emb_evict")
      .outputMode("append").start()
    val (evictPairs, evictState) = try {
      timedCorpus.foreach { b => memE.addData(b: _*); qE.processAllAvailable() }
      (spark.table("emb_evict").select("vec_a", "vec_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        lastStateRows(qE))
    } finally { qE.stop(); spark.sql("DROP TABLE IF EXISTS emb_evict") }

    assert(!evictPairs.contains((0L, 100L)),
      "a pair straddling the horizon must not be emitted")
    assert(evictPairs.contains((0L, 1L)) && evictPairs.contains((110L, 111L)),
      "within-horizon pairs stay exact")
    // cross-horizon = any pair joining the t=0 cohort (ids ≤ 5) to the
    // t≥2h cohort (ids ≥ 100); everything else must survive untouched
    val expected = noEvictPairs.filterNot { case (a, b) => a <= 5L && b >= 100L }
    assert(evictPairs == expected,
      s"horizon mode may only drop cross-horizon pairs: $evictPairs vs $noEvictPairs")
    assert(evictState < noEvictState,
      s"eviction must shrink state: $evictState !< $noEvictState (NoTimeout carries every bucket)")
  }

  test("horizon mode with horizon >= corpus span equals the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Double], java.sql.Timestamp)]
    val timed = corpus.map { case (i, v) =>
      (i, v, new java.sql.Timestamp((86400L + i) * 1000L))
    }
    val q = EmbStream.pairsStreamEvicting(
        EmbStream.bandRowsT(mem.toDF().toDF("vec_id", "v", "ts"), NBits, Bands)
          .as[EmbStream.BandVecT],
        horizonMs = (corpus.size + 1L) * 1000L,
        watermarkDelay = s"${corpus.size} seconds").toDF()
      .writeStream.format("memory").queryName("emb_evict_span")
      .outputMode("append").start()
    val got = try {
      val (b1, b2) = timed.splitAt(21)
      Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("emb_evict_span").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS emb_evict_span") }
    assert(got == batchPairs,
      "a horizon covering the whole span must be output-invisible vs the batch pipeline")
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
