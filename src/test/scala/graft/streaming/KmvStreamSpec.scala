package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming KMV sketch (kmv_distinct_stream): the k-min-distinct fold is
  * commutative, idempotent, and monotone, so the final per-group state
  * must be invariant to batch splits, row order, and duplicate feeds —
  * and equal to the batch sketch. State is bounded at k hashes per group
  * by construction (every emitted nh ≤ k). */
class KmvStreamSpec extends SparkSpec {

  private val K = 8

  /** 3 groups × 60 keys with heavy duplication (key space 40/group). */
  private def corpus: Seq[(String, Long)] =
    for (g <- Seq("A", "B", "C"); i <- 0 until 60)
      yield (g, (i * 2654435761L + g.hashCode) % 40 + g.hashCode * 1000L)

  /** Run the sketch over the given batches; return final (nh, hk) per
    * group (max-seen emission) plus the max nh ever emitted. */
  private def run(batches: Seq[Seq[(String, Long)]],
                  parts: Int = 0): (Map[String, (Int, Long)], Int) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val name = s"kmv_mem_${System.nanoTime()}"
    val src = mem.toDS()
    // parts > 0 spreads each micro-batch so the r16 map-side partials
    // (per-partition k-min sets) genuinely merge in the keyed state fold
    val spread = if (parts > 0) src.repartition(parts) else src
    val q = KmvStream.sketchStream(
        spread.map { case (f, h) => KmvStream.KeyedHash(f, h) }, K)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val fin = rows.groupBy(_._1).map { case (g, rs) =>
      val last = rs.maxBy(_._2)
      g -> (last._3, last._4)
    }
    (fin, rows.map(_._3).max)
  }

  test("final sketch state is invariant to batch splits and row order") {
    val c = corpus
    val (oneShot, _) = run(Seq(c))
    val (threeWay, _) = run(c.grouped(60).toSeq)
    val (shuffled, _) = run(Seq(c.reverse.take(90), c.take(90)))
    assert(oneShot == threeWay, "batch split moved the sketch")
    assert(oneShot == shuffled, "row order / duplicate overlap moved the sketch")
  }

  test("map-side partials merge across partitions exactly (r16 internals)") {
    val c = corpus
    val (oneShot, _) = run(Seq(c))
    val (spread, mx) = run(c.grouped(60).toSeq, parts = 7)
    assert(oneShot == spread,
      "per-partition k-min partials drifted from the row-at-a-time fold")
    assert(mx <= K, s"emitted nh exceeded k under partials: $mx")
  }

  test("duplicate re-feed is idempotent; state stays bounded at k") {
    val c = corpus
    val (once, m1) = run(Seq(c))
    val (twice, m2) = run(Seq(c, c)) // at-least-once upstream replay
    assert(once.view.mapValues(_._2).toMap == twice.view.mapValues(_._2).toMap,
      "re-fed rows moved h_k — hash-set idempotence broken")
    assert(m1 <= K && m2 <= K, s"emitted nh exceeded k: $m1 / $m2")
  }

  test("final state equals the batch k-min-distinct computation") {
    val c = corpus
    val (fin, _) = run(c.grouped(25).toSeq)
    val expected = c.groupBy(_._1).map { case (g, rows) =>
      val mins = rows.map(_._2).distinct.sorted.take(K)
      g -> (mins.length, mins.last)
    }
    assert(fin == expected)
  }
}
