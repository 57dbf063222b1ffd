package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Windowed streaming CMS (cms_freq_stream_win): per-window matrices must
  * equal the batch fold, window state must be EVICTED once the watermark
  * passes the window end, and a row arriving after its window's eviction
  * must be excluded (watermark-late) rather than resurrecting state —
  * eviction and lateness are one decision. */
class WinCmsStreamSpec extends SparkSpec {

  private val W = 16      // sketch width
  private val WinMs = 1000L
  private val Base = 86400000L // day 1 — keeps every ts above the initial watermark

  /** (winOffset, r, c, tsOffsetMs) → WinBucket rows in window Base/1000+winOffset. */
  private def rows(b: Seq[(Int, Int, Long, Long)]): Seq[(Long, Int, Long, Long)] =
    b.map { case (w, r, c, dt) =>
      ((Base / WinMs) + w, r, c, Base + w * WinMs + dt)
    }

  private def run(batches: Seq[Seq[(Long, Int, Long, Long)]])
      : (Map[(Long, Int), Seq[Long]], Long, Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, Long, Long)]
    val name = s"wincms_${System.nanoTime()}"
    val src = mem.toDF().toDF("win", "r", "c", "ms")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")))
      .withWatermark("ts", "0 seconds")
      .select("win", "r", "c", "ts").as[WinCmsStream.WinBucket]
    val q = WinCmsStream.sketchStream(src, W, WinMs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val (maxState, finalState) = try {
      var mx = 0L
      batches.foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
        mx = math.max(mx, stateRows(q))
      }
      (mx, stateRows(q))
    } finally q.stop()
    val snaps = spark.table(name)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2), r.getSeq[Long](3)))
    val fin = snaps.groupBy(_._1).map { case (k, ss) => k -> ss.maxBy(_._2)._3 }
    (fin, maxState, finalState)
  }

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators).lastOption.map(_.numRowsTotal)
      .getOrElse(0L)

  test("per-window matrices equal the batch fold under ordered splits") {
    val all = rows(Seq(
      (0, 0, 3L, 10L), (0, 0, 3L, 20L), (0, 1, 7L, 30L),
      (1, 0, 3L, 10L), (1, 1, 7L, 20L), (1, 1, 7L, 30L),
      (2, 0, 5L, 10L)))
    val (fin, _, _) = run(Seq(
      all.filter(_._1 == all.head._1), // window 0 batch
      all.filter(r => r._1 == all.head._1 + 1),
      all.filter(r => r._1 == all.head._1 + 2)))
    val expected = all.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val counts = new Array[Long](W)
      rs.foreach(r => counts(r._3.toInt) += 1)
      k -> counts.toSeq
    }
    assert(fin.view.mapValues(_.toSeq).toMap == expected)
  }

  test("watermark-passed windows evict; a post-eviction late row is excluded") {
    val w0 = rows(Seq((0, 0, 3L, 10L), (0, 0, 4L, 20L)))
    val w5 = rows(Seq((5, 0, 9L, 10L))) // jumps the watermark past window 0's end
    val late0 = rows(Seq((0, 0, 3L, 30L))) // same window 0 — now watermark-late
    val w6 = rows(Seq((6, 0, 2L, 10L), (6, 1, 4L, 20L)))
    val w6more = rows(Seq((6, 0, 2L, 30L))) // no new group — lets the drop show
    val (fin, maxState, finalState) = run(Seq(w0, w5, late0 ++ w6, w6more))

    // window 0's final matrix is exactly its pre-eviction content: the
    // late row neither resurrected state nor leaked into a snapshot
    val k0 = ((Base / WinMs), 0)
    val expected0 = { val a = new Array[Long](W); a(3) = 1; a(4) = 1; a.toSeq }
    assert(fin(k0).toSeq == expected0,
      s"late row must be excluded from evicted window 0: ${fin(k0)}")
    // state genuinely dropped mid-stream: four groups were created and
    // emitted snapshots ((w0,0), (w5,0), (w6,0), (w6,1)), but windows 0
    // and 5 evicted once the watermark passed their ends (the engine
    // fires timeouts in the watermark-commit batch inside the same
    // processAllAvailable), so the final state holds only window 6
    assert(fin.size == 4, s"all four groups must have emitted: ${fin.keySet}")
    assert(finalState < fin.size && finalState <= 2,
      s"no eviction observed: final=$finalState of ${fin.size} groups " +
        s"(peak $maxState)")
    // the evicted window 5's emitted snapshot is still served
    assert(fin(((Base / WinMs) + 5, 0)).toSeq(9) == 1L)
    // the double-fed window 6 cell accumulated across batches 3 and 4
    assert(fin(((Base / WinMs) + 6, 0)).toSeq(2) == 2L)
  }

  test("catalog entry: ordered staging yields one micro-batch per window") {
    val dir = sf("sf0.001")
    val out = graft.queries.AdvancedQueries.cmsFreqStreamWindowed(spark, dir)
      .collect()
    assert(out.nonEmpty && out.length % graft.queries.AdvancedQueries.CmsWinTopK == 0)
    val offsets = graft.queries.StreamScratch.path("cmswin").resolve("ckpt/offsets")
    assert(java.nio.file.Files.exists(offsets), s"no offsets at $offsets")
    val nBatches = java.nio.file.Files.list(offsets)
      .filter(p => p.getFileName.toString.forall(_.isDigit)).count()
    val nWindows = out.map(_.getLong(0)).distinct.length
    assert(nBatches >= nWindows,
      s"expected >= $nWindows micro-batches (one per staged window), got $nBatches")
  }
}
