package graft.queries

import graft.SparkSpec
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** MEASURED shuffle volume, not just plan shapes: PlanSpec proves the plan
  * says `BroadcastHashJoin`; this spec proves what that buys — the bytes
  * that actually cross the wire. The broadcast-dimension form of the q3
  * join must move orders of magnitude less shuffle data than the same
  * query forced onto sort-merge, because the fact table never
  * repartitions. At 1000 executors this difference is the job. */
class ShuffleBudgetSpec extends SparkSpec {

  /** Total shuffle-write bytes across all tasks triggered by `body`. */
  private def shuffleBytes(body: => Unit): Long = {
    val acc = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          acc.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // listener events are async: poll until the counter goes quiet
      var last = -1L
      var spins = 0
      while (acc.get != last && spins < 50) {
        last = acc.get; spins += 1; Thread.sleep(100)
      }
      acc.get
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("broadcast-dim q3 join moves >=10x less shuffle data than forced sort-merge") {
    val dir = sf("sf0.01")
    def q3(): Unit = { RelationalQueries.q3TopRevenue(spark, dir).collect(); () }
    val broadcastBytes = shuffleBytes(q3())
    val smjBytes = withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      shuffleBytes {
        // the same join shape hand-built WITHOUT broadcast hints, so the
        // planner actually falls back to shuffled joins
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val ord = spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = spark.read.parquet(s"$dir/customer.parquet")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
          .orderBy(col("rev").desc).limit(10).collect()
        ()
      }
    }
    assert(smjBytes > 0, "the forced sort-merge run must actually shuffle")
    // the catalog plan only shuffles the tiny post-broadcast aggregate
    assert(broadcastBytes * 10 <= smjBytes,
      s"broadcast plan must move >=10x less: broadcast=$broadcastBytes smj=$smjBytes")
  }

  test("pack_sequences shuffles ~metadata, never the documents") {
    val dir = sf("sf0.01")
    val corpusBytes = java.nio.file.Files.size(
      java.nio.file.Paths.get(s"$dir/documents.parquet"))
    val packBytes = shuffleBytes {
      TextDedupQueries.packSequences(spark, dir).collect(); ()
    }
    assert(packBytes > 0, "the packing window must shuffle its metadata")
    // the one shuffle carries (doc_id, n_tokens, shard) rows — a fraction
    // of the compressed corpus size, and nothing text-sized
    assert(packBytes < corpusBytes,
      s"packing must shuffle doc metadata, not documents: $packBytes vs corpus $corpusBytes")
  }
}
