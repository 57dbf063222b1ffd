package graft.streaming

import graft.SparkSpec

/** Streaming Bloom filter (bloom_membership_stream): bit-OR is
  * commutative, associative, and IDEMPOTENT, so the final sharded filter
  * must be invariant to batch splits, row order, and duplicate feeds —
  * the KMV replay-safety class, in contrast to CMS where the same re-feed
  * must double. State per shard is the fixed-width bit slice. */
class BloomStreamSpec extends SparkSpec {

  private val ShardBits = 128L // 2 words per shard
  private val Shards = 4

  /** Deterministic position set with collisions and cross-shard spread. */
  private def positions: Seq[BloomStream.PosShard] =
    for (i <- 0L until 300L) yield {
      val pos = (i * 2654435761L) % (ShardBits * Shards)
      BloomStream.PosShard((pos % Shards).toInt, pos / Shards)
    }

  /** Run the fold; return the final bit slice per shard (max-seen). */
  private def run(batches: Seq[Seq[BloomStream.PosShard]]): Map[Int, Seq[Long]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, Long)]
    val name = s"bloom_mem_${System.nanoTime()}"
    val q = BloomStream.filterStream(
        mem.toDS().map { case (s, l) => BloomStream.PosShard(s, l) }, ShardBits)
      .toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map(x => (x.shard, x.local)): _*); q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table(name)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2)))
    rows.groupBy(_._1).map { case (s, snaps) =>
      val last = snaps.maxBy(_._2)._3
      assert(last.length == ((ShardBits + 63) / 64).toInt, "state width drifted")
      s -> last
    }
  }

  test("final filter is invariant to batch splits, row order, AND duplicate re-feed") {
    val p = positions
    val oneShot = run(Seq(p))
    val threeWay = run(p.grouped(101).toSeq)
    val shuffled = run(Seq(p.reverse))
    val twice = run(Seq(p, p)) // at-least-once replay — a NO-OP for bit-OR
    assert(oneShot == threeWay, "batch split moved the filter")
    assert(oneShot == shuffled, "row order moved the filter")
    assert(oneShot == twice,
      "a re-fed row changed the filter — bit-OR idempotence broken")
  }

  test("final filter equals the batch-built bit set exactly") {
    val p = positions
    val fin = run(p.grouped(77).toSeq)
    val expected = p.groupBy(_.shard).map { case (s, ps) =>
      val words = new Array[Long](((ShardBits + 63) / 64).toInt)
      ps.foreach(x => words((x.local / 64).toInt) |= 1L << (x.local % 64))
      s -> words.toSeq
    }
    assert(fin.view.mapValues(_.toSeq).toMap == expected)
  }

  test("catalog entry: streamed filter serves the batch entry's exact contract") {
    val dir = sf("sf0.001")
    val streamed = graft.queries.AdvancedQueries.bloomMembershipStream(spark, dir)
      .collect().map(_.toSeq).toVector
    val batch = graft.queries.AdvancedQueries.qBloomMembership(spark, dir)
      .collect().map(_.toSeq).toVector
    assert(streamed == batch, "stream hop changed the membership contract")
    val offsets = graft.queries.StreamScratch.path("bloom").resolve("ckpt/offsets")
    assert(java.nio.file.Files.exists(offsets), s"no offsets at $offsets")
    assert(java.nio.file.Files.list(offsets).count() > 1,
      "expected multiple micro-batches")
  }
}
