package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The `readStream.format("graftstore")` change-feed source
  * ([[GraftStoreChangeSource]]): commit-version offsets, per-commit batch
  * boundaries under admission control, restart-with-checkpoint resuming
  * past consumed versions, kill-mid-drain recovery, and the net-fold
  * correctness of the drained feed (`store_cdf_stream` gates the values;
  * this pins the streaming mechanics the hash gate can't see). */
class CdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_cdfsrc").toString

  /** A store with base + two delta commits: v2 updates key 0 / inserts
    * key 100 (bucket 0), v3 deletes key 1 (bucket 1). */
  private def threeCommitStore(): String = {
    val dir = tmp()
    val base = (0L until 12L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.commitUpsert(spark,
      Seq((0L, 1000L, 0), (100L, 7L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    Versioned.commitDelete(spark, Seq((1L, 1)).toDF("k", "bucket"), dir, 3,
      "k", "bucket")
    dir
  }

  private def drain(dir: String, out: String, ckpt: String,
                    opts: (String, String)*): Unit = {
    val reader = opts.foldLeft(
      spark.readStream.format("graftstore")
        .option("path", dir).option("keyCol", "k")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val q = reader.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("AvailableNow drains every commit; rows match the library change feed per version") {
    val dir = threeCommitStore()
    val root = tmp()
    drain(dir, s"$root/out", s"$root/ckpt")
    val got = spark.read.parquet(s"$root/out")
      .select(col("_commit_version"), col("op"), col("k"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    val want = (2 to 3).flatMap { v =>
      val (cdf, _) = Versioned.changes(spark, dir, v - 1, v, "k")
      cdf.collect().map(r => (v, r.getAs[String]("op"), r.getAs[Long]("k"),
        Option(r.getAs[Any]("v")).map(_.asInstanceOf[Long]).getOrElse(-1L)))
    }.toSet
    assert(got == want, "the drained feed is the per-commit library feed")
    assert(got.map(_._1) == Set(2, 3), "both post-base commits emitted")
  }

  test("maxVersionsPerTrigger=1 yields one batch per commit (admission control under AvailableNow)") {
    val dir = threeCommitStore()
    val root = tmp()
    val batches = scala.collection.mutable.ArrayBuffer.empty[Set[Int]]
    val q = spark.readStream.format("graftstore")
      .option("path", dir).option("keyCol", "k")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += b.select(col("_commit_version")).distinct()
          .collect().map(_.getInt(0)).toSet
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.filter(_.nonEmpty).toSeq == Seq(Set(2), Set(3)),
      s"one commit per micro-batch, in order — got $batches")
  }

  test("restart with the same checkpoint resumes past consumed versions: no dupes, no losses") {
    val dir = threeCommitStore()
    val root = tmp()
    // first run drains v2..v3
    drain(dir, s"$root/out", s"$root/ckpt", "maxVersionsPerTrigger" -> "1")
    val afterFirst = spark.read.parquet(s"$root/out").count()
    // a NEW commit lands (v4: update key 2, bucket 2), the stream restarts
    Versioned.commitUpsert(spark, Seq((2L, 2222L, 2)).toDF("k", "v", "bucket"),
      dir, 4, "k", "bucket")
    drain(dir, s"$root/out", s"$root/ckpt", "maxVersionsPerTrigger" -> "1")
    val rows = spark.read.parquet(s"$root/out")
      .select(col("_commit_version"), col("op"), col("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.length == afterFirst + 1, "exactly the one new change appended")
    assert(rows.count(_._1 == 4) == 1 && rows.contains((4, "U", 2L)),
      "the resumed stream emitted ONLY v4's change")
    assert(rows.count(t => t._1 == 2 || t._1 == 3) == afterFirst.toInt,
      "no pre-restart version re-emitted")
  }

  test("kill mid-drain, resume: the feed completes exactly once") {
    val dir = threeCommitStore()
    val root = tmp()
    // run 1: admission control pins the first batch to v2 only, and we
    // stop the query after that batch commits (AvailableNow would go on)
    val q1 = spark.readStream.format("graftstore")
      .option("path", dir).option("keyCol", "k")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()
    eventually {
      assert(spark.read.parquet(s"$root/out")
        .select(col("_commit_version")).distinct().count() >= 1)
    }
    q1.stop() // the kill: v3 not yet (necessarily) consumed
    // resume with the same checkpoint under AvailableNow: drains the rest
    drain(dir, s"$root/out", s"$root/ckpt", "maxVersionsPerTrigger" -> "1")
    val versions = spark.read.parquet(s"$root/out")
      .groupBy(col("_commit_version")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(versions.keySet == Set(2, 3), "both commits present after resume")
    val (cdf2, _) = Versioned.changes(spark, dir, 1, 2, "k")
    val (cdf3, _) = Versioned.changes(spark, dir, 2, 3, "k")
    assert(versions(2) == cdf2.count() && versions(3) == cdf3.count(),
      "each commit's changes appear EXACTLY once (no replay duplication)")
  }

  test("withPreimage: the stream serves the four-op feed — U- carries the OLD payload") {
    val dir = threeCommitStore()
    val root = tmp()
    val q = spark.readStream.format("graftstore")
      .option("path", dir).option("keyCol", "k")
      .option("withPreimage", "true").load()
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$root/out")
      .select(col("_commit_version"), col("op"), col("k"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // v2 updated key 0 (0 -> 1000): both images present, old payload on U-
    assert(got.contains((2, "U-", 0L, 0L)) && got.contains((2, "U+", 0L, 1000L)))
    assert(got.contains((2, "I", 100L, 7L)))
    assert(got.contains((3, "D", 1L, 1L)))
    assert(!got.exists(_._2 == "U"), "the net single-op 'U' never appears in preimage mode")
  }

  test("schema evolution: a batch entirely BEFORE the evolving commit null-fills the new column") {
    val dir = tmp()
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // v2: a plain update (no new column yet)
    Versioned.commitUpsert(spark, Seq((0L, 100L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    // v3: ADDITIVE evolution — the delta carries column w
    Versioned.commitUpsert(spark,
      Seq((1L, 200L, 1, "tag")).toDF("k", "v", "bucket", "w"), dir, 3,
      "k", "bucket")
    val root = tmp()
    // maxVersionsPerTrigger=1: batch 1 covers ONLY v2 — a range with no
    // frame carrying w at all; the declared (latest) schema includes it
    drain(dir, s"$root/out", s"$root/ckpt", "maxVersionsPerTrigger" -> "1")
    val rows = spark.read.parquet(s"$root/out")
      .select(col("_commit_version"), col("k"),
        col("w")).collect()
      .map(r => (r.getInt(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(rows.contains((2, 0L, None)), "the pre-evolution batch null-fills w")
    assert(rows.contains((3, 1L, Some("tag"))), "the evolving commit carries w")
  }

  test("schema: op + key + payload + _commit_version; empty-range recovery serves an empty frame") {
    val dir = threeCommitStore()
    val df = spark.readStream.format("graftstore")
      .option("path", dir).option("keyCol", "k").load()
    assert(df.schema.fieldNames.toSeq == Seq("op", "k", "v", "bucket", "_commit_version"))
    assert(df.isStreaming)
    // startingVersion below 2 is rejected loudly
    val e = intercept[Exception] {
      spark.readStream.format("graftstore")
        .option("path", dir).option("keyCol", "k")
        .option("startingVersion", "1").load()
        .writeStream.format("noop").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    }
    assert(e.getMessage.contains("startingVersion") ||
      Option(e.getCause).exists(_.getMessage.contains("startingVersion")))
  }

  /** Poll up to ~20 s for a streaming assertion to become true. */
  private def eventually(check: => Unit): Unit = {
    val deadline = System.nanoTime() + 20L * 1000 * 1000 * 1000
    var ok = false
    while (!ok) {
      try { check; ok = true }
      catch {
        case e: Throwable =>
          if (System.nanoTime() > deadline) throw e
          Thread.sleep(200)
      }
    }
  }
}
