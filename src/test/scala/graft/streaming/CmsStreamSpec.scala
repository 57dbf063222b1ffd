package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming count-min sketch (cms_freq_stream): counters ADD, so the
  * final matrix must be invariant to batch splits and row order and
  * equal the batch sketch exactly; a re-fed row must DOUBLE its buckets
  * (CMS is deliberately NOT idempotent — exactly-once delivery is the
  * entry's contract, asserted here so nobody mistakes it for the KMV
  * fold). State is d groups × w longs by construction. */
class CmsStreamSpec extends SparkSpec {

  private val W = 32
  private val D = 3

  /** Bucket stream for a keyed corpus: d deterministic bucket coordinates
    * per key (the fold is hash-agnostic — catalog-hash parity is covered
    * by the entry-vs-entry test below; narrow w so collisions occur). */
  private def buckets(keys: Seq[Long]): Seq[CmsStream.Bucket] =
    keys.flatMap { k =>
      (0 until D).map { r =>
        CmsStream.Bucket(r, java.lang.Math.floorMod(k * 2654435761L + r, W.toLong))
      }
    }

  private def corpus: Seq[Long] =
    for (i <- 0L until 200L) yield i % 37 // heavy duplication

  /** Run the fold over the given batches; return the final matrix
    * (max-seen snapshot per row) as (r, c) -> count. `parts` > 0 spreads
    * every micro-batch over that many partitions BEFORE the fold, so the
    * r16 map-side partial aggregation genuinely produces several partials
    * per sketch row per batch and the keyed state fold must merge them. */
  private def run(batches: Seq[Seq[CmsStream.Bucket]],
                  parts: Int = 0): Map[(Int, Int), Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Long)]
    val name = s"cms_mem_${System.nanoTime()}"
    val src = mem.toDS()
    val spread = if (parts > 0) src.repartition(parts) else src
    val q = CmsStream.sketchStream(
        spread.map { case (r, c) => CmsStream.Bucket(r, c) }, W)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map(x => (x.r, x.c)): _*); q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
    rows.groupBy(_._1).flatMap { case (r, snaps) =>
      val last = snaps.maxBy(_._2)._3
      assert(last.length == W, s"state width drifted: ${last.length}")
      last.zipWithIndex.collect { case (n, c) if n > 0 => (r, c) -> n }
    }.toMap
  }

  test("final matrix is invariant to batch splits and row order") {
    val b = buckets(corpus)
    val oneShot = run(Seq(b))
    val threeWay = run(b.grouped(b.size / 3 + 1).toSeq)
    val shuffled = run(Seq(b.reverse))
    assert(oneShot == threeWay, "batch split moved the matrix")
    assert(oneShot == shuffled, "row order moved the matrix")
  }

  test("map-side partials merge across partitions exactly (r16 internals)") {
    val b = buckets(corpus)
    val expected = b.groupBy(x => (x.r, x.c.toInt))
      .view.mapValues(_.size.toLong).toMap
    // 7 partitions × 3 sketch rows → up to 21 partials per batch; the
    // merged matrix must equal the single-partition row-at-a-time count
    assert(run(b.grouped(70).toSeq, parts = 7) == expected,
      "partial merge drifted from the exact count")
  }

  test("final matrix equals the batch count exactly; re-feed doubles (NOT idempotent)") {
    val b = buckets(corpus)
    val fin = run(b.grouped(70).toSeq)
    val expected = b.groupBy(x => (x.r, x.c.toInt))
      .view.mapValues(_.size.toLong).toMap
    assert(fin == expected, "streamed fold drifted from the batch count")
    val twice = run(Seq(b, b))
    assert(twice == expected.view.mapValues(_ * 2).toMap,
      "a re-fed row must double its buckets — CMS is additive, not idempotent")
  }

  test("catalog entry: streamed matrix serves the batch oracle's exact report") {
    val dir = sf("sf0.001")
    val streamed = graft.queries.AdvancedQueries.cmsFreqStream(spark, dir)
      .collect().map(_.toSeq).toVector
    val batch = graft.queries.AdvancedQueries.qTopkFreqCms(spark, dir)
      .collect().map(_.toSeq).toVector
    assert(streamed == batch, "stream hop changed the heavy-hitter report")
    // and the gated run genuinely crossed micro-batch boundaries
    val offsets = graft.queries.StreamScratch.path("cms").resolve("ckpt/offsets")
    assert(java.nio.file.Files.exists(offsets), s"no offsets at $offsets")
    assert(java.nio.file.Files.list(offsets).count() > 1,
      "expected multiple micro-batches")
  }
}
