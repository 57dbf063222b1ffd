package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The `writeStream.format("graftstore")` sink: batch-id → commit-version
  * mapping, restart-resume without re-application, replay idempotence,
  * and the mode/partitioning guards (`store_sink_stream` gates the final
  * table values; this pins the streaming mechanics). */
class GraftSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_sink").toString

  private def runStream(inDir: String, table: String, ckpt: String,
                        schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream.format("graftstore")
      .option("path", table).option("keyCol", "k")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("each micro-batch is one commit; restart resumes past applied batches; replay no-ops") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 12L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 4)
    def deltaFile(keys: Seq[Long], bump: Long): Unit =
      keys.map(k => (k, k + bump, (k % 4).toInt)).toDF("k", "v", "bucket")
        .coalesce(1).write.mode("append").parquet(inDir)

    deltaFile(Seq(0L, 4L), bump = 100L)
    runStream(inDir, table, ckpt, base.schema)
    assert(Versioned.latestVersion(table) == 2, "batch 0 -> version 2")
    val v2Files = new java.io.File(s"$table/data/v2").list().sorted.toSeq
    assert(Versioned.readVersion(spark, table, 2)
      .where(col("k") === 0L).head().getLong(1) == 100L)

    // "restart": two more files, same checkpoint — the applied batch must
    // not re-apply (no rewrite of v2), the new files land as v3 and v4
    deltaFile(Seq(1L), bump = 200L)
    deltaFile(Seq(2L, 6L), bump = 300L)
    runStream(inDir, table, ckpt, base.schema)
    assert(Versioned.latestVersion(table) == 4,
      "exactly one version per new batch after resume")
    assert(new java.io.File(s"$table/data/v2").list().sorted.toSeq == v2Files,
      "the resumed stream never rewrote the pre-restart commit")
    val fin = Versioned.readVersion(spark, table, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin(0L) == 100L && fin(1L) == 201L && fin(2L) == 302L && fin(6L) == 306L)
    assert(fin.size == 12, "upserts, not appends — key count unchanged")

    // hard replay under a FRESH checkpoint is a NEW QUERY (r15, txn
    // markers are query-scoped by checkpoint digest): re-delivering into
    // versions another query committed FAILS LOUD — the ownership rule —
    // and never silently absorbs or overwrites the existing history
    val before = (2 to 4).map(v =>
      new java.io.File(s"$table/data/v$v").list().sorted.toSeq)
    val eReplay = intercept[Exception] {
      runStream(inDir, table, s"$root/ckpt2", base.schema)
    }
    assert(exceptionChain(eReplay).exists(_.contains("another")),
      s"expected the cross-query ownership error, got: " +
        exceptionChain(eReplay).mkString(" | "))
    assert(Versioned.latestVersion(table) == 4, "no fifth version appeared")
    assert((2 to 4).map(v =>
      new java.io.File(s"$table/data/v$v").list().sorted.toSeq) == before,
      "the rejected replay committed NOTHING")
  }

  test("a foreign commit aliasing the sink's version fails LOUD instead of dropping the batch") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 2)
    // a maintenance job commits version 2 FIRST (no sink txn marker)
    Versioned.commitUpsert(spark, Seq((0L, 777L, 0)).toDF("k", "v", "bucket"),
      table, 2, "k", "bucket")
    Seq((1L, 111L, 1)).toDF("k", "v", "bucket").coalesce(1)
      .write.mode("append").parquet(inDir)
    val e = intercept[Exception] { runStream(inDir, table, ckpt, base.schema) }
    assert(exceptionChain(e).exists(_.contains("another")),
      s"expected the foreign-commit error, got: ${exceptionChain(e).mkString(" | ")}")
    assert(Versioned.readVersion(spark, table, 2)
      .where(col("k") === 0L).head().getLong(1) == 777L,
      "the foreign commit is untouched — the sink never overwrote it")
  }

  test("guards: Complete mode and partitionBy are rejected; firstVersion below 2 is rejected") {
    val root = tmp()
    val (table, inDir) = (s"$root/table", s"$root/in")
    val base = (0L until 4L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 2)
    base.coalesce(1).write.parquet(inDir)
    def start(f: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]
              => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]) = {
      val w = spark.readStream.schema(base.schema).parquet(inDir)
        .writeStream.format("graftstore")
        .option("path", table).option("keyCol", "k")
        .option("checkpointLocation", s"$root/ckpt_${System.nanoTime()}")
        .trigger(Trigger.AvailableNow())
      val q = f(w).start(); q.awaitTermination()
    }
    val e1 = intercept[Exception] { start(_.outputMode("complete")) }
    assert(exceptionChain(e1).exists(_.contains("Complete")))
    val e2 = intercept[Exception] { start(_.partitionBy("bucket")) }
    assert(exceptionChain(e2).exists(m => m.contains("bucket column") || m.contains("partition")))
    val e3 = intercept[Exception] { start(_.option("firstVersion", "1")) }
    assert(exceptionChain(e3).exists(_.contains("firstVersion")))
  }

  test("crash window: a stamped marker with NO manifest (crash between marker and commit) resumes cleanly") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 2)
    // simulate the crash: batch 0's marker landed, the commit did not —
    // exactly the window the marker-first ordering (r15) creates
    Versioned.writeTxnMarker(table, 2,
      s"graftsink:${GraftStoreSource.sinkQueryTag(Some(ckpt))}:0")
    Seq((0L, 900L, 0)).toDF("k", "v", "bucket").coalesce(1)
      .write.mode("append").parquet(inDir)
    runStream(inDir, table, ckpt, base.schema) // must NOT wedge
    assert(Versioned.latestVersion(table) == 2)
    assert(Versioned.readVersion(spark, table, 2)
      .where(col("k") === 0L).head().getLong(1) == 900L,
      "the replay re-ran the deterministic commit under its own marker")
  }

  test("crash window: a FOREIGN in-flight marker (no manifest) fails loud, never overwrites") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 2)
    Versioned.writeTxnMarker(table, 2, "someone-else:batch7")
    Seq((0L, 900L, 0)).toDF("k", "v", "bucket").coalesce(1)
      .write.mode("append").parquet(inDir)
    val e = intercept[Exception] { runStream(inDir, table, ckpt, base.schema) }
    assert(exceptionChain(e).exists(_.contains("another")),
      s"expected the in-flight ownership error, got: ${exceptionChain(e).mkString(" | ")}")
    assert(Versioned.latestVersion(table) == 1, "nothing was committed over the claim")
  }

  test("query tag canonicalizes the checkpoint path: spelling variants share one identity") {
    val abs = tmp() // an absolute path
    val tag = GraftStoreSource.sinkQueryTag(Some(abs))
    // trailing slash, doubled separators, dot segments — SAME query, and
    // (r16, ADVICE) the same tag: a restart with a differently-spelled
    // checkpoint must read its own commits as its own, never fail loud
    // as a foreign writer
    assert(GraftStoreSource.sinkQueryTag(Some(s"$abs/")) == tag)
    assert(GraftStoreSource.sinkQueryTag(Some(abs.replace("/", "//"))) == tag)
    assert(GraftStoreSource.sinkQueryTag(Some(s"$abs/./")) == tag)
    // distinct checkpoints stay distinct
    assert(GraftStoreSource.sinkQueryTag(Some(s"$abs-other")) != tag)
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
}
