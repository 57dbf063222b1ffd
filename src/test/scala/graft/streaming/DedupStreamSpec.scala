package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup dedup (dedup_pairs_stream): the stateful band-bucket
  * pipeline must equal the batch UNCAPPED MinHash pipeline on the same
  * corpus, and a two-batch split must equal the one-batch run — the state
  * carries bucket membership across micro-batches, so pairs STRADDLING the
  * batch boundary are found exactly once. */
class DedupStreamSpec extends SparkSpec {

  private def corpus: Seq[(Long, String)] = {
    // planted near-dup pairs straddling any split point + distinct filler
    val base = "the quick brown fox jumps over the lazy dog wearing number"
    (0L until 40L).map { i =>
      if (i % 2 == 1) (i, s"$base ${i - 1} end") // near-dup of doc i-1
      else (i, s"$base $i end")
    }
  }

  private def runStream(batches: Seq[Seq[(Long, String)]]): Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val bands = DocStream.bandRows(mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .as[DocStream.BandDoc]
    val q = DocStream.pairsStream(bands).toDF()
      .writeStream.format("memory").queryName("dedup_pairs_mem")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("dedup_pairs_mem").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS dedup_pairs_mem")
    }
  }

  test("one-batch stream == two-batch stream == batch uncapped pairs") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val sh = Dedup.docShinglesRaw(docs, "doc_id", "text")
    val sigs = Dedup.minhashSignatures(sh)
    val batch = Dedup.jaccardPairs(sh, 0.8,
        candidates = Some(Dedup.lshCandidates(sigs)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixture must contain confirmed pairs")
    val oneShot = runStream(Seq(corpus))
    assert(oneShot == batch, "one-batch stream must equal the batch pipeline")
    // split in the middle of the doc range: pairs (i, i+1) with i=19/20 on
    // opposite sides exercise the carried state
    val (b1, b2) = corpus.splitAt(21)
    val twoShot = runStream(Seq(b1, b2))
    assert(twoShot == batch, "a batch split must be result-invisible")
  }

  test("restart between days: checkpointed bucket state survives, pairs exactly once") {
    import spark.implicits._
    // the continuous-crawl contract end to end: day 1 runs to completion
    // (AvailableNow) and the query STOPS; day 2's files land; a NEW query
    // on the SAME checkpoint processes only the increment, and the sink
    // holds exactly the batch pairs of the combined corpus — cross-day
    // pairs found via state recovered from the checkpoint, nothing
    // duplicated, nothing lost.
    val root = java.nio.file.Files.createTempDirectory("dedup_stream_restart")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val (day1, day2) = corpus.splitAt(21)
    def runDay(batch: Seq[(Long, String)]): Unit = {
      batch.toDF("doc_id", "text").write.mode("append").parquet(inDir)
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING").parquet(inDir)
      val q = DocStream.pairsStream(
          DocStream.bandRows(stream, "doc_id", "text").as[DocStream.BandDoc])
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
    val got = spark.read.schema("doc_a LONG, doc_b LONG, jaccard DOUBLE")
      .parquet(outDir)
    // exactly-once at the ROW level modulo multi-band finds: after the
    // band-level distinct the sink equals the batch pipeline exactly
    val docs = corpus.toDF("doc_id", "text")
    val sh = Dedup.docShinglesRaw(docs, "doc_id", "text")
    val batch = Dedup.jaccardPairs(sh, 0.8,
        candidates = Some(Dedup.lshCandidates(Dedup.minhashSignatures(sh))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val streamed = got.distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "restart seam must be result-invisible")
    // a pair emitted twice with DIFFERENT jaccard would survive distinct —
    // assert pair keys are unique after the band-dedup too
    val keyCounts = got.distinct().groupBy(col("doc_a"), col("doc_b")).count()
      .where(col("count") > 1).count()
    assert(keyCounts == 0, "no pair may carry two different jaccard values")
    // cross-day pairs really exist (the state was load-bearing)
    assert(batch.exists { case (a, b, _) => a < 21 && b >= 21 },
      "fixture must contain cross-day pairs")
  }

  // ---- horizon-eviction mode (the text twin of EmbStream's) ----

  private val HourMs = 3600L * 1000L

  /** Planted timeline: an exact-dup pair (0,1) plus filler at t=0; two
    * hours later a dup of doc 0 (id 100, CROSS-horizon) and a fresh
    * within-horizon pair (110,111); a lone late row advances the
    * watermark past the t=0 buckets' timeout. Horizon = 1 h. */
  private def timedCorpus: Seq[Seq[(Long, String, java.sql.Timestamp)]] = {
    val base = "the quick brown fox jumps over the lazy dog wearing number"
    val b2 = "many colorful balloons drifted above the quiet harbor during festival number"
    // +1 day: a row AT the initial watermark (epoch 0) is dropped as late
    def ts(sec: Long) = new java.sql.Timestamp((86400L + sec) * 1000L)
    val t0 = Seq((0L, s"$base 0 end", ts(0)), (1L, s"$base 0 end", ts(0))) ++
      (2L to 5L).map(i => (i, s"$base ${i * 997} end", ts(0)))
    val t2h = Seq(
      (100L, s"$base 0 end", ts(7200)), // dup of doc 0, two horizons late
      (110L, s"$b2 110 end", ts(7200)), (111L, s"$b2 110 end", ts(7200)))
    val late = Seq((200L, s"$b2 424242 end", ts(7201)))
    Seq(t0, t2h, late)
  }

  private def lastStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators).lastOption.map(_.numRowsTotal)
      .getOrElse(sys.error("no state operator progress recorded"))

  test("horizon mode: cross-horizon dups suppressed, state evicted, within-horizon exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference run: NoTimeout path on the same rows (event time ignored)
    val memN = MemoryStream[(Long, String)]
    val qN = DocStream.pairsStream(
        DocStream.bandRows(memN.toDF().toDF("doc_id", "text"), "doc_id", "text")
          .as[DocStream.BandDoc]).toDF()
      .writeStream.format("memory").queryName("dedup_noevict")
      .outputMode("append").start()
    val (noEvictPairs, noEvictState) = try {
      timedCorpus.foreach { b =>
        memN.addData(b.map(r => (r._1, r._2)): _*); qN.processAllAvailable()
      }
      (spark.table("dedup_noevict").select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        lastStateRows(qN))
    } finally { qN.stop(); spark.sql("DROP TABLE IF EXISTS dedup_noevict") }
    assert(noEvictPairs.contains((0L, 100L)),
      "fixture: without a horizon the stale dup must be found (collision is real)")
    assert(noEvictPairs.contains((0L, 1L)) && noEvictPairs.contains((110L, 111L)))

    // horizon run: 1 h horizon, zero watermark delay (event times ordered)
    val memE = MemoryStream[(Long, String, java.sql.Timestamp)]
    val qE = DocStream.pairsStreamEvicting(
        DocStream.bandRowsT(memE.toDF().toDF("doc_id", "text", "ts"),
          "doc_id", "text").as[DocStream.BandDocT],
        horizonMs = HourMs, watermarkDelay = "0 seconds").toDF()
      .writeStream.format("memory").queryName("dedup_evict")
      .outputMode("append").start()
    val (evictPairs, evictState) = try {
      timedCorpus.foreach { b => memE.addData(b: _*); qE.processAllAvailable() }
      (spark.table("dedup_evict").select("doc_a", "doc_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
        lastStateRows(qE))
    } finally { qE.stop(); spark.sql("DROP TABLE IF EXISTS dedup_evict") }

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
    val docs = corpus.toDF("doc_id", "text")
    val sh = Dedup.docShinglesRaw(docs, "doc_id", "text")
    val batch = Dedup.jaccardPairs(sh, 0.8,
        candidates = Some(Dedup.lshCandidates(Dedup.minhashSignatures(sh))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val timed = corpus.map { case (i, t) =>
      (i, t, new java.sql.Timestamp((86400L + i) * 1000L))
    }
    val q = DocStream.pairsStreamEvicting(
        DocStream.bandRowsT(mem.toDF().toDF("doc_id", "text", "ts"),
          "doc_id", "text").as[DocStream.BandDocT],
        horizonMs = (corpus.size + 1L) * 1000L,
        watermarkDelay = s"${corpus.size} seconds").toDF()
      .writeStream.format("memory").queryName("dedup_evict_span")
      .outputMode("append").start()
    val got = try {
      val (b1, b2) = timed.splitAt(21)
      Seq(b1, b2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table("dedup_evict_span").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS dedup_evict_span") }
    assert(got == batch,
      "a horizon covering the whole span must be output-invisible vs the batch pipeline")
  }

  test("per-row streaming signatures equal the batch groupBy signatures") {
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    // batch: explode + groupBy; streaming: per-row array_min — the minhash
    // values (and hence every band key) must be bit-identical
    val batchSig = Dedup.minhashSignatures(
        Dedup.docShinglesRaw(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val streamKeys = DocStream.bandRows(docs, "doc_id", "text")
    val fromKeys = streamKeys
      .select(col("doc"), col("band"), posexplode(split(col("key"), ",")))
      .select(col("doc"), (col("band") * 4 + col("pos")).as("h"),
        col("col").cast("long").as("minhash"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(fromKeys == batchSig)
  }
}
