package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed streaming KMV (kmv_distinct_stream_win): per-window sketches
  * must equal the batch fold, duplicate hashes must be no-ops (the KMV
  * idempotence class — unlike the windowed CMS twin where a re-feed
  * doubles), and watermark-passed windows must evict with late rows
  * excluded. */
class WinKmvStreamSpec extends SparkSpec {

  private val K = 4
  private val WinMs = 1000L
  private val Base = 86400000L

  /** (winOffset, hash, tsOffsetMs) → (win, h, ms). */
  private def rows(b: Seq[(Int, Long, Long)]): Seq[(Long, Long, Long)] =
    b.map { case (w, h, dt) => ((Base / WinMs) + w, h, Base + w * WinMs + dt) }

  private def run(batches: Seq[Seq[(Long, Long, Long)]])
      : (Map[Long, (Int, Long)], Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val name = s"winkmv_${System.nanoTime()}"
    val src = mem.toDF().toDF("win", "h", "ms")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")))
      .select("win", "h", "ts").withWatermark("ts", "0 seconds")
      .as[WinKmvStream.WinHash]
    val q = WinKmvStream.sketchStream(src, K, WinMs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val finalState = try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.recentProgress.flatMap(_.stateOperators).lastOption
        .map(_.numRowsTotal).getOrElse(0L)
    } finally q.stop()
    val snaps = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    (snaps.groupBy(_._1).map { case (w, ss) =>
      val last = ss.maxBy(_._2); w -> (last._3, last._4)
    }, finalState)
  }

  test("per-window sketch equals batch fold; duplicate hashes are no-ops") {
    val w0 = (Base / WinMs)
    val all = rows(Seq(
      (0, 50L, 10L), (0, 20L, 20L), (0, 80L, 30L), (0, 20L, 40L), // dup 20
      (0, 90L, 50L), (0, 10L, 60L),                               // 5 distinct > K
      (1, 7L, 10L), (1, 3L, 20L)))
    val (oneShot, _) = run(Seq(all))
    val (split, _) = run(all.grouped(3).toSeq)
    assert(oneShot == split, "batch split moved a window's sketch")
    // window 0: k=4 smallest distinct of {50,20,80,90,10} → nh=4, hk=80
    assert(oneShot(w0) == ((4, 80L)), s"got ${oneShot(w0)}")
    // window 1: 2 distinct < k → nh=2, hk = max kept = 7
    assert(oneShot(w0 + 1) == ((2, 7L)))
    // a full duplicate re-feed within the live horizon cannot move sketches
    val (twice, _) = run(Seq(all, all))
    assert(twice == oneShot, "re-fed rows changed a sketch — idempotence broken")
  }

  test("watermark-passed windows evict; late rows excluded") {
    val w0 = (Base / WinMs)
    val b1 = rows(Seq((0, 50L, 10L), (0, 20L, 20L)))
    val b2 = rows(Seq((5, 9L, 10L)))           // watermark jumps past window 0
    val b3 = rows(Seq((0, 5L, 30L), (6, 2L, 10L))) // the w0 row is now late
    val (fin, finalState) = run(Seq(b1, b2, b3))
    assert(fin(w0) == ((2, 50L)),
      s"late row must not reach evicted window 0: ${fin(w0)}")
    assert(fin.size == 3 && finalState < fin.size,
      s"expected eviction: final=$finalState of ${fin.size} windows")
  }
}
