package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming GDPR mechanics (`gdpr_delete_stream`, r9 verdict #7):
  * delete requests stream through the `q_cdc_stream` exactly-once guard
  * into [[Versioned.commitDelete]], a restart mid-apply must not
  * re-delete (idempotent versioning), and vacuum must leave NO doomed
  * key in any file on disk — the claim GDPR actually makes, checked
  * against the raw parquet, not the manifest view. */
class GdprStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_gdpr").toString

  private def guardedDelete(b: DataFrame, batchId: Long, table: String): Unit = {
    val v = batchId.toInt + 2
    if (!Versioned.hasVersion(table, v))
      Versioned.commitDelete(b.sparkSession, b, table, v, "k", "bucket")
  }

  test("restart-safe streamed deletes; vacuum leaves no doomed bytes") {
    val root = tmp()
    val (table, inDir, ckpt) = (s"$root/table", s"$root/in", s"$root/ckpt")
    val base = (0L until 40L).map(k => (k, s"payload-$k", (k % 4).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, table, "bucket", 4)
    val doomed = Seq(0L, 7L, 13L, 21L, 34L)

    def requestFile(keys: Seq[Long]): Unit =
      keys.map(k => (k, (k % 4).toInt)).toDF("k", "bucket")
        .coalesce(1).write.mode("append").parquet(inDir)

    val reqSchema = Seq((0L, 0)).toDF("k", "bucket").schema
    def runStream(): Unit = {
      val q = spark.readStream.schema(reqSchema)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => guardedDelete(b, id, table))
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // first delivery: two requests -> version 2
    requestFile(doomed.take(2))
    runStream()
    assert(Versioned.latestVersion(table) == 2)
    assert(Versioned.readVersion(spark, table, 2).count() == 38)

    // "restart": the checkpoint resumes past the applied file; the
    // replayed batch 0 must commit nothing (manifest guard)
    requestFile(doomed.slice(2, 5))
    runStream()
    assert(Versioned.latestVersion(table) == 3,
      "exactly one new version for the one new request file")
    guardedDelete(doomed.take(2).map(k => (k, (k % 4).toInt))
      .toDF("k", "bucket"), batchId = 0L, table)
    assert(Versioned.latestVersion(table) == 3,
      "a replayed request batch must not re-commit")

    // pre-vacuum: snapshot isolation still SERVES doomed rows at v1/v2
    assert(Versioned.readVersion(spark, table, 1).count() == 40)
    // the complete forget
    Versioned.vacuum(table, keep = 1)
    val finalState = Versioned.readVersion(spark, table, 3)
    assert(finalState.count() == 35)
    assert(finalState.where(col("k").isin(doomed: _*)).isEmpty)
    // the GDPR claim, against raw bytes: every parquet file still on disk
    // is free of doomed keys (no manifest indirection; one read per
    // version dir — mixed partitioned roots can't share a glob)
    val remaining = new java.io.File(s"$table/data").listFiles()
      .filter(_.isDirectory)
      .map(d => spark.read.parquet(d.toString).select("k"))
      .reduce(_ unionByName _)
    assert(remaining.where(col("k").isin(doomed: _*)).isEmpty,
      "a doomed key survived in a physical file after vacuum")
  }
}
