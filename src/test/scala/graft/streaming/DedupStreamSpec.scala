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
