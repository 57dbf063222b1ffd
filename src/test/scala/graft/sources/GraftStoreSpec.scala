package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The DSv2 connector over the versioned store: reader-syntax version
  * resolution must equal the library API's, pushed filters must DRIVE the
  * sidecar bucket skipping (proved behaviorally: a sidecar poisoned to
  * exclude a bucket makes the connector MISS that bucket's rows — so the
  * scan demonstrably consulted it), and the seam must otherwise be
  * result-invisible. */
class GraftStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_store_dsv2").toString

  private def read(dir: String, opts: (String, String)*) =
    opts.foldLeft(spark.read.format("graftstore").option("path", dir)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  test("version resolution: latest, versionAsOf, timestampAsOf — all equal the library read") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.commitUpsert(spark, Seq((0L, 1000L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    val t1 = java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
    val t2 = java.time.Instant.parse("2024-01-02T00:00:00Z").getEpochSecond * 1000000L
    Versioned.writeCommitTime(dir, 1, t1)
    Versioned.writeCommitTime(dir, 2, t2)

    def sums(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(col("v"))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(sums(read(dir)) == sums(Versioned.readVersion(spark, dir, 2)),
      "no option: the latest commit")
    assert(sums(read(dir, "versionAsOf" -> "1")) ==
      sums(Versioned.readVersion(spark, dir, 1)))
    assert(sums(read(dir, "timestampAsOf" -> s"${t1 + 1}")) ==
      sums(Versioned.readVersion(spark, dir, 1)),
      "epoch-micros between commits resolves to the earlier version")
    // the string form parses as UTC wall time
    assert(sums(read(dir, "timestampAsOf" -> "2024-01-01 12:00:00")) ==
      sums(Versioned.readVersion(spark, dir, 1)))
    assert(sums(read(dir, "timestampAsOf" -> "2024-01-02 00:00:00")) ==
      sums(Versioned.readVersion(spark, dir, 2)),
      "the exact commit boundary resolves to that commit")
    intercept[Exception] { read(dir, "versionAsOf" -> "9") }
  }

  test("column pruning and residual filters: subset select + predicate equal the library read") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, k * 10, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    val got = read(dir).where(col("k") % 2 === 0).select(col("v"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 40L by 2).map(_ * 10).toSeq)
    // zero-column scan (count(*)) works through the pruned schema
    assert(read(dir).count() == 40)
  }

  test("zone maps drive bucket skipping: a range filter demonstrably consults the sidecar") {
    val dir = tmp()
    // bucket = value stripe: bucket b holds v in [100b, 100b+10)
    val base = (0 until 4).flatMap(b => (0 until 10).map(i =>
      (b * 100L + i, 100L * b + i, b))).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.writeStats(spark, dir, 1, "v")
    assert(Versioned.statsCol(dir, 1).contains("v"), "the zone column is recorded in-band")

    // the decision function: a [100, 210] range keeps exactly buckets 1, 2
    assert(GraftStoreSource.zoneKeepBuckets(dir, 1, 100L, 210L) == Set(1, 2))
    val df = read(dir).where(col("v") >= 100L && col("v") <= 210L)
    assert(df.collect().map(_.getLong(1)).sorted.toSeq ==
      ((100L until 110L) ++ (200L until 210L)).toSeq)
    // pushdown is visible in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("v"),
      s"pushed filters must surface in the scan node, got:\n$plan")

    // BEHAVIORAL skip proof: poison the sidecar to exclude bucket 2's zone
    // line — if the scan consults the zone maps, bucket 2's in-range rows
    // disappear from the connector read (a scan ignoring the sidecar would
    // still return them; a plain filter on the library read still does)
    val statsPath = java.nio.file.Paths.get(dir, "manifests", "v1.stats.csv")
    val lines = new String(Files.readAllBytes(statsPath), "UTF-8").split("\n")
    Files.write(statsPath, lines.filterNot(_.startsWith("2,")).mkString("\n").getBytes("UTF-8"))
    val skipped = read(dir).where(col("v") >= 100L && col("v") <= 210L)
      .collect().map(_.getLong(1)).sorted.toSeq
    assert(skipped == (100L until 110L).toSeq,
      "bucket 2 must be SKIPPED once its zone line is gone — the scan consulted the sidecar")
    assert(Versioned.readVersion(spark, dir, 1)
      .where(col("v") >= 100L && col("v") <= 210L).count() == 20,
      "the unpruned library read still sees both buckets (the sidecar, not the data, changed)")
  }

  test("bloom index drives point-lookup skipping; a store without sidecars serves unpruned") {
    val dir = tmp()
    val base = (0L until 64L).map(k => (k, s"p$k", (k % 4).toInt)).toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.writeBloomIndex(spark, dir, 1, "k")

    // key 13 lives in bucket 1; the decision keeps (at least) bucket 1
    assert(GraftStoreSource.bloomKeepBuckets(dir, 1, Seq(13L)).contains(1))
    assert(read(dir).where(col("k") === 13L).count() == 1)
    assert(read(dir).where(col("k").isin(13L, 26L)).count() == 2)

    // poison: drop bucket 1's filter line — the probe for 13 now skips its
    // bucket, so the connector returns nothing (no false negatives ONLY
    // while the sidecar is intact; this proves the scan consulted it)
    val bloomPath = java.nio.file.Paths.get(dir, "manifests", "v1.bloom.csv")
    val lines = new String(Files.readAllBytes(bloomPath), "UTF-8").split("\n")
    Files.write(bloomPath, lines.filterNot(_.startsWith("1,")).mkString("\n").getBytes("UTF-8"))
    assert(read(dir).where(col("k") === 13L).count() == 0,
      "bucket 1 must be SKIPPED once its filter line is gone — the scan consulted the index")

    // a bare store (no sidecars) serves every filter unpruned-correct
    val dir2 = tmp()
    Versioned.commitBase(base, dir2, "bucket", 4)
    assert(read(dir2).where(col("k") === 13L).count() == 1)
    assert(read(dir2).where(col("k") >= 10L && col("k") < 20L).count() == 10)
  }

  test("metadata-only aggregates: COUNT/MIN/MAX from sidecars with ZERO data IO; inexact shapes decline") {
    val dir = tmp()
    val base = (0 until 4).flatMap(b => (0 until 10).map(i =>
      (b * 100L + i, 100L * b + i, b))).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.writeStats(spark, dir, 1, "v")
    Versioned.writeRowCounts(spark, dir, 1)

    val agg = read(dir).agg(count(lit(1)).as("n"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "the statistics query must push completely")
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((40L, 0L, 309L)))

    // shapes the sidecars can't answer exactly DECLINE and scan data:
    // a residual filter, a grouping, a non-zone column
    val filtered = read(dir).where(col("v") >= 100L).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(filtered.head().getLong(0) == 30L)
    val grouped = read(dir).groupBy(col("bucket")).count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(grouped.count() == 4)
    val otherCol = read(dir).agg(min(col("k")))
    assert(!otherCol.queryExecution.executedPlan.toString.contains("PushedAggregates"))
    assert(otherCol.head().getLong(0) == 0L)

    // the ZERO-IO proof: delete EVERY data file — with a caller-supplied
    // schema the metadata aggregate still answers (nothing else could)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"$dir/data"))
    val ghost = spark.read.format("graftstore")
      .schema("k LONG, v LONG, bucket INT").option("path", dir).load()
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(ghost.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((40L, 0L, 309L)),
      "every data file is gone — only the sidecars could have answered")
  }

  test("schema evolution and empty-sentinel buckets read through the connector") {
    val dir = tmp()
    val base = (0L until 12L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // v2: delete ALL of bucket 1 (empty sentinel)
    Versioned.commitDelete(spark,
      (0L until 12L).filter(_ % 2 == 1).map(k => (k, 1)).toDF("k", "bucket"),
      dir, 2, "k", "bucket")
    assert(read(dir).count() == 6, "the sentinel bucket contributes nothing")
    assert(read(dir, "versionAsOf" -> "1").count() == 12, "time travel still serves v1")
  }
}
