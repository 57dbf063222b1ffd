package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** The table-to-table streaming hop (graftstore source → graftstore sink,
  * the bronze→silver composition): content equality end to end, one B
  * commit per A commit, and kill-mid-hop resume with no duplicate and no
  * lost commit — CdfSourceSpec's and GraftSinkSpec's disciplines composed
  * through one pipeline. */
class GraftHopSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_hop").toString

  /** A: base + two upsert commits; B: the same base. */
  private def stage(root: String): (String, String) = {
    val (a, b) = (s"$root/a", s"$root/b")
    val base = (0L until 24L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, a, "bucket", 4)
    Versioned.commitUpsert(spark,
      Seq((0L, 100L, 0), (5L, 105L, 1)).toDF("k", "v", "bucket"), a, 2, "k", "bucket")
    Versioned.commitUpsert(spark,
      Seq((100L, 700L, 0), (2L, 302L, 2)).toDF("k", "v", "bucket"), a, 3, "k", "bucket")
    Versioned.commitBase(base, b, "bucket", 4)
    (a, b)
  }

  private def hop(a: String, b: String, ckpt: String,
                  trigger: Trigger = Trigger.AvailableNow()) =
    spark.readStream.format("graftstore")
      .option("path", a).option("keyCol", "k")
      .option("maxVersionsPerTrigger", "1").load()
      .where(col("op") =!= "D")
      .select(col("k"), col("v"), col("bucket"))
      .writeStream.format("graftstore")
      .option("path", b).option("keyCol", "k")
      .option("checkpointLocation", ckpt)
      .trigger(trigger).start()

  private def state(dir: String): Map[Long, Long] =
    Versioned.readVersion(spark, dir, Versioned.latestVersion(dir))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap

  private def eventually[T](body: => T): T = {
    val deadline = System.currentTimeMillis() + 60000
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return body
      catch { case t: Throwable => last = t; Thread.sleep(200) }
    }
    throw last
  }

  test("the hop replicates A into B commit-for-commit; final states equal") {
    val root = tmp()
    val (a, b) = stage(root)
    val q = hop(a, b, s"$root/ckpt")
    q.awaitTermination()
    assert(Versioned.latestVersion(b) == 3, "A v2/v3 became B v2/v3")
    assert(state(b) == state(a), "the hop is content-invisible")
    // intermediate versions line up too (commit-for-commit, not just final)
    assert(Versioned.readVersion(spark, b, 2).collect().map(_.getLong(1)).sorted.toSeq
      == Versioned.readVersion(spark, a, 2).collect().map(_.getLong(1)).sorted.toSeq)
  }

  test("CDC mode (opCol): the hop replicates DELETES too; non-D ops upsert") {
    val root = tmp()
    val (a, b) = stage(root)
    // a third A commit: DELETE keys 3 and 7 (both bucket 3)
    Versioned.commitDelete(spark, Seq((3L, 3), (7L, 3)).toDF("k", "bucket"),
      a, 4, "k", "bucket")
    val q = spark.readStream.format("graftstore")
      .option("path", a).option("keyCol", "k")
      .option("maxVersionsPerTrigger", "1").load()
      .select(col("op"), col("k"), col("v"), col("bucket"))
      .writeStream.format("graftstore")
      .option("path", b).option("keyCol", "k").option("opCol", "op")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(Versioned.latestVersion(b) == 4)
    val sb = state(b)
    assert(!sb.contains(3L) && !sb.contains(7L), "the delete commit replicated")
    assert(sb == state(a), "full mutation history replayed: states equal")
  }

  test("kill mid-hop, resume: every A commit lands in B exactly once") {
    val root = tmp()
    val (a, b) = stage(root)
    val q1 = hop(a, b, s"$root/ckpt", Trigger.ProcessingTime(0))
    eventually { assert(Versioned.latestVersion(b) >= 2) }
    q1.stop() // the kill: v3 may or may not have landed
    val q2 = hop(a, b, s"$root/ckpt")
    q2.awaitTermination()
    assert(Versioned.latestVersion(b) == 3, "resume drained the rest, no extra version")
    assert(state(b) == state(a))
    val tag = GraftStoreSource.sinkQueryTag(Some(s"$root/ckpt"))
    assert(Versioned.txnMarker(b, 2).contains(s"graftsink:$tag:0") &&
      Versioned.txnMarker(b, 3).contains(s"graftsink:$tag:1"),
      "each B commit carries exactly its query+batch marker — replays no-op'd")
  }
}
