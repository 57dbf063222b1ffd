package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Shallow clone on the versioned store ([[Versioned.cloneShallow]]):
  * zero-copy creation, cross-directory read resolution, divergence
  * leaving the source untouched, vacuum safety, and the single-hop /
  * empty-target guards (`store_clone` gates the values; this pins the
  * file-level mechanics the hash gate can't see). */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_clone").toString

  private def allFiles(dir: String): Map[String, Seq[Byte]] = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    if (!root.exists()) Map.empty
    else walk(root).map(f =>
      f.getPath.stripPrefix(dir) -> Files.readAllBytes(f.toPath).toSeq).toMap
  }

  private def parquetCount(dir: String): Int = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    if (root.exists()) walk(root) else 0
  }

  test("a clone is manifest-sized (zero data files) and reads the source version exactly") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, src, "bucket", 4)
    Versioned.commitUpsert(spark, Seq((0L, 1000L, 0)).toDF("k", "v", "bucket"),
      src, 2, "k", "bucket")
    Versioned.cloneShallow(src, dst, 2)

    assert(parquetCount(s"$dst/data") == 0, "zero-copy: no data files in the clone")
    assert(Versioned.latestVersion(dst) == 1)
    assert(Versioned.readVersion(spark, dst, 1).collect().map(_.toSeq).toSet ==
      Versioned.readVersion(spark, src, 2).collect().map(_.toSeq).toSet,
      "the clone serves the source version byte-for-value")
    // manifest entries are all external references
    assert(Versioned.readManifest(dst, 1).values.forall(_ >= Versioned.ExtBase))
  }

  test("divergence rewrites only touched buckets locally; the source is never written") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, src, "bucket", 4)
    Versioned.cloneShallow(src, dst, 1)
    val srcBytes = allFiles(src)

    // diverge: touch bucket 1 only
    Versioned.commitUpsert(spark, Seq((1L, 999L, 1)).toDF("k", "v", "bucket"),
      dst, 2, "k", "bucket")
    assert(allFiles(src) == srcBytes, "the source is byte-identical after divergence")
    val m2 = Versioned.readManifest(dst, 2)
    assert(m2(1) == 2, "the touched bucket points at clone-local v2")
    assert((m2 - 1).values.forall(_ >= Versioned.ExtBase),
      "untouched buckets still reference the source")
    // content: the diverged read mixes local and external buckets
    val got = Versioned.readVersion(spark, dst, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 999L && got(0L) == 0L && got.size == 40)
    // and the clone's v1 still time-travels to the pre-divergence state
    assert(Versioned.readVersion(spark, dst, 1)
      .where(col("k") === 1L).head().getLong(1) == 1L)
  }

  test("vacuum on the clone deletes only clone-local files, never the source's") {
    val root = tmp()
    val (src, dst) = (s"$root/src", s"$root/dst")
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, src, "bucket", 4)
    Versioned.cloneShallow(src, dst, 1)
    val srcBytes = allFiles(src)
    Versioned.commitUpsert(spark, Seq((1L, 999L, 1)).toDF("k", "v", "bucket"),
      dst, 2, "k", "bucket")
    Versioned.commitUpsert(spark, Seq((1L, 998L, 1)).toDF("k", "v", "bucket"),
      dst, 3, "k", "bucket")
    Versioned.vacuum(dst, keep = 1)
    assert(allFiles(src) == srcBytes, "vacuum walked only the clone's data dir")
    assert(!Versioned.hasVersion(dst, 1) && !Versioned.hasVersion(dst, 2))
    // the kept version still reads (local v3 bucket + external buckets)
    val got = Versioned.readVersion(spark, dst, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 998L && got.size == 40)
  }

  test("guards: clone-of-clone and clone-into-nonempty are rejected") {
    val root = tmp()
    val (src, dst, dst2) = (s"$root/src", s"$root/dst", s"$root/dst2")
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, src, "bucket", 2)
    Versioned.cloneShallow(src, dst, 1)
    val e = intercept[Exception] { Versioned.cloneShallow(dst, dst2, 1) }
    assert(e.getMessage.contains("shallow clone"))
    val e2 = intercept[Exception] { Versioned.cloneShallow(src, dst, 1) }
    assert(e2.getMessage.contains("already holds commits"))
  }
}
