package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming CDC apply into the versioned store (`q_cdc_stream`'s
  * mechanics): deterministic-batch-id version commits, restart-resume
  * without re-application, and replay idempotence via the manifest guard. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_cdc").toString

  private def guardedApply(b: DataFrame, batchId: Long, table: String): Unit = {
    val v = batchId.toInt + 2
    if (!Versioned.hasVersion(table, v))
      Versioned.commitUpsert(b.sparkSession, b, table, v, "k", "bucket")
  }

  test("restart resumes without re-applying; replayed batches commit nothing") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 12L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, table, "bucket", 4)

    def deltaFile(keys: Seq[Long], bump: Long): Unit =
      keys.map(k => (k, k + bump, (k % 4).toInt)).toDF("k", "v", "bucket")
        .coalesce(1).write.mode("append").parquet(inDir)

    def runStream(): Unit = {
      val stream = spark.readStream
        .schema(base.schema).option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => guardedApply(b, id, table))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // first delivery: one delta file -> version 2
    deltaFile(Seq(0L, 4L), bump = 100L)
    runStream()
    assert(Versioned.latestVersion(table) == 2)
    val v2Files = new java.io.File(s"$table/data/v2").list().sorted.toSeq

    // "restart": two more files arrive, the SAME checkpoint resumes — the
    // already-processed file must not re-apply (no version renumbering, no
    // double bump), the new files land as versions 3 and 4
    deltaFile(Seq(1L), bump = 200L)
    deltaFile(Seq(2L, 6L), bump = 300L)
    runStream()
    assert(Versioned.latestVersion(table) == 4,
      "exactly one version per new batch after resume")
    assert(new java.io.File(s"$table/data/v2").list().sorted.toSeq == v2Files,
      "the resumed stream must not rewrite the pre-restart version")

    // replay: re-delivering batch 0 commits nothing (manifest guard)
    val replayed = Seq((0L, 999L, 0)).toDF("k", "v", "bucket")
    guardedApply(replayed, batchId = 0L, table)
    assert(Versioned.latestVersion(table) == 4)
    assert(Versioned.readVersion(spark, table, 4)
      .where(col("k") === 0).head().getLong(1) == 100L,
      "a replayed batch must not change committed state")

    // final state == the batch upsert of all deltas over the base
    val expect = Map(0L -> 100L, 4L -> 104L, 1L -> 201L, 2L -> 302L, 6L -> 306L)
    val got = Versioned.readVersion(spark, table, 4)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._2).toMap
    assert(got.size == 12)
    (0L until 12L).foreach { k =>
      assert(got(k) == expect.getOrElse(k, k), s"key $k")
    }
  }
}
