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

  test("SQL INSERT INTO lands a commitUpsert: upsert-on-key, untouched buckets byte-identical, the view serves the new state") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    val before = bucketFiles(dir, 1, 1).map(p => p -> Files.readAllBytes(p).toSeq).toMap

    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gsw_t1 " +
      s"USING graftstore OPTIONS (path '$dir', keyCol 'k')")
    // delta: update key 0 (bucket 0), insert key 100 (bucket 0) — buckets
    // 1..3 untouched; column order = table order (partition col last)
    Seq((0L, 1000L, 0), (100L, 7L, 0)).toDF("k", "v", "bucket")
      .createOrReplaceTempView("gsw_delta1")
    spark.sql("INSERT INTO gsw_t1 SELECT * FROM gsw_delta1")

    assert(Versioned.latestVersion(dir) == 2, "the INSERT is a real commit")
    val v2 = Versioned.readVersion(spark, dir, 2)
    assert(v2.count() == 41 && v2.where(col("k") === 0L).head().getLong(1) == 1000L,
      "upsert semantics: key 0 updated, key 100 inserted")
    val after = bucketFiles(dir, 1, 1).map(p => p -> Files.readAllBytes(p).toSeq).toMap
    assert(before == after, "an untouched bucket's v1 files are byte-identical")
    // the unpinned view re-resolves at scan time: it SEES the insert
    assert(spark.sql("SELECT sum(v) FROM gsw_t1").head().getLong(0) ==
      v2.agg(sum(col("v"))).head().getLong(0),
      "a view created before the INSERT serves the post-INSERT state")
    // ...while a pinned read stays the frozen snapshot
    assert(read(dir, "versionAsOf" -> "1").count() == 40)
  }

  test("commitVersion makes replayed writes idempotent (the txn-app-id discipline)") {
    val dir = tmp()
    val base = (0L until 20L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    def writeOnce(): Unit =
      Seq((0L, 555L, 0)).toDF("k", "v", "bucket")
        .write.format("graftstore").mode("append")
        .option("path", dir).option("keyCol", "k")
        .option("commitVersion", "2").save()
    writeOnce()
    assert(Versioned.latestVersion(dir) == 2)
    val snap = Versioned.readVersion(spark, dir, 2)
      .collect().map(_.toSeq).toSet
    writeOnce() // the replay: manifest v2 exists -> commits NOTHING
    assert(Versioned.latestVersion(dir) == 2, "no third version appeared")
    assert(Versioned.readVersion(spark, dir, 2).collect().map(_.toSeq).toSet == snap)
  }

  test("INSERT OVERWRITE is a commitRewrite: new content serves, old versions still time travel") {
    val dir = tmp()
    val base = (0L until 20L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gsw_t3 " +
      s"USING graftstore OPTIONS (path '$dir', keyCol 'k')")
    (100L until 106L).map(k => (k, k * 2, (k % 2).toInt)).toDF("k", "v", "bucket")
      .createOrReplaceTempView("gsw_over")
    spark.sql("INSERT OVERWRITE gsw_t3 SELECT * FROM gsw_over")
    assert(Versioned.latestVersion(dir) == 2)
    assert(spark.sql("SELECT count(*), sum(v) FROM gsw_t3").head().toSeq ==
      Seq(6L, (100L until 106L).map(_ * 2).sum),
      "the view serves ONLY the overwrite content")
    assert(read(dir, "versionAsOf" -> "1").count() == 20,
      "overwrite is a commit, not an erase — v1 still travels")
  }

  test("a version-pinned view rejects writes; append without keyCol fails loudly") {
    val dir = tmp()
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gsw_pinned " +
      s"USING graftstore OPTIONS (path '$dir', keyCol 'k', versionAsOf '1')")
    Seq((0L, 9L, 0)).toDF("k", "v", "bucket").createOrReplaceTempView("gsw_d4")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gsw_pinned SELECT * FROM gsw_d4")
    }
    assert(e.getMessage.contains("version-pinned") ||
      Option(e.getCause).exists(_.getMessage.contains("version-pinned")))
    assert(Versioned.latestVersion(dir) == 1, "nothing committed")
    val e2 = intercept[Exception] {
      Seq((0L, 9L, 0)).toDF("k", "v", "bucket")
        .write.format("graftstore").mode("append").option("path", dir).save()
    }
    assert(e2.getMessage.contains("keyCol") ||
      Option(e2.getCause).exists(_.getMessage.contains("keyCol")))
  }

  test("first append into an empty dir bootstraps the store (commitBase)") {
    val dir = tmp() + "/fresh"
    (0L until 12L).map(k => (k, k, (k % 3).toInt)).toDF("k", "v", "bucket")
      .write.format("graftstore").mode("append")
      .option("path", dir).option("bucketCol", "bucket").option("nBuckets", "3")
      .save()
    assert(Versioned.latestVersion(dir) == 1)
    assert(read(dir).count() == 12)
    // and the NEXT append is a normal upsert commit
    Seq((0L, 500L, 0)).toDF("k", "v", "bucket")
      .write.format("graftstore").mode("append")
      .option("path", dir).option("keyCol", "k").save()
    assert(Versioned.latestVersion(dir) == 2)
    assert(read(dir).where(col("k") === 0L).head().getLong(1) == 500L)
  }

  /** The parquet files of one bucket dir of one version. */
  private def bucketFiles(dir: String, ver: Int, bucket: Int): Seq[java.nio.file.Path] = {
    val d = new java.io.File(s"$dir/data/v$ver/bucket=$bucket")
    Option(d.listFiles).getOrElse(Array.empty).toSeq
      .filter(_.getName.endsWith(".parquet")).map(_.toPath).sortBy(_.toString)
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

  test("a foreign commit aliasing an explicit commitVersion fails LOUD (the sink's guard, batch surface)") {
    val dir = tmp()
    val base = (0L until 20L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // a maintenance job lands version 2 first, with no txn marker
    Versioned.commitUpsert(spark, Seq((0L, 777L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    val e = intercept[Exception] {
      Seq((1L, 111L, 1)).toDF("k", "v", "bucket")
        .write.format("graftstore").mode("append")
        .option("path", dir).option("keyCol", "k")
        .option("commitVersion", "2").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("another"))),
      s"expected the aliasing error, got: ${e.getMessage}")
    assert(Versioned.readVersion(spark, dir, 2)
      .where(col("k") === 0L).head().getLong(1) == 777L,
      "the foreign commit is untouched")
    // distinct writer identity (txnAppId) makes the same version number
    // legible as a DIFFERENT claim — still rejected, not silently merged
    intercept[Exception] {
      Seq((1L, 111L, 1)).toDF("k", "v", "bucket")
        .write.format("graftstore").mode("append")
        .option("path", dir).option("keyCol", "k")
        .option("commitVersion", "2").option("txnAppId", "jobB").save()
    }
  }

  test("bootstrap rejects commitVersion != 1 and honors the marker at 1 (idempotent bootstrap)") {
    val dir = tmp()
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    intercept[Exception] {
      base.write.format("graftstore").mode("append")
        .option("path", dir).option("bucketCol", "bucket")
        .option("commitVersion", "5").save()
    }
    assert(Versioned.latestVersion(dir) == 0, "the rejected bootstrap wrote nothing")
    def boot(): Unit = base.write.format("graftstore").mode("append")
      .option("path", dir).option("bucketCol", "bucket").option("nBuckets", "2")
      .option("commitVersion", "1").save()
    boot()
    assert(Versioned.latestVersion(dir) == 1)
    assert(Versioned.txnMarker(dir, 1).contains("graftinsert:v1"),
      "the bootstrapping writer's identity is recorded at version 1")
    boot() // the replay recognizes its own commit
    assert(Versioned.latestVersion(dir) == 1, "idempotent from the first commit")
  }

  test("INSERT schema evolution: extras rejected without evolveSchema, additive with it; positional insert resolves") {
    val dir = tmp()
    val base = (0L until 20L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // extras without opting in: fail (a typo'd column must not fork the schema)
    val e = intercept[Exception] {
      Seq((0L, 5L, 0, "x")).toDF("k", "v", "bucket", "extra")
        .write.format("graftstore").mode("append")
        .option("path", dir).option("keyCol", "k").save()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains("evolveSchema"))))
    assert(Versioned.latestVersion(dir) == 1)
    // opted in: additive evolution; a pinned old read never sees the column
    Seq((0L, 5L, 0, "x")).toDF("k", "v", "bucket", "extra")
      .write.format("graftstore").mode("append")
      .option("path", dir).option("keyCol", "k")
      .option("evolveSchema", "true").save()
    val v2 = read(dir)
    assert(v2.columns.contains("extra"))
    assert(v2.where(col("k") === 0L).head().getAs[String]("extra") == "x")
    assert(v2.where(col("extra").isNotNull).count() == 1,
      "untouched-key provenance null-fills")
    assert(!read(dir, "versionAsOf" -> "1").columns.contains("extra"))
    // POSITIONAL insert (SQL semantics): arity-matched columns rename+cast
    // to the table's served order — (k, v, bucket, extra) after evolution
    assert(v2.columns.toSeq == Seq("k", "v", "bucket", "extra"))
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gse_t USING graftstore " +
      s"OPTIONS (path '$dir', keyCol 'k')")
    Seq((3L, 333, 1, "y")).toDF("a", "b", "c", "d")
      .createOrReplaceTempView("gse_pos")
    spark.sql("INSERT INTO gse_t SELECT * FROM gse_pos")
    val v3 = read(dir)
    val got = v3.where(col("k") === 3L).head()
    assert(got.getAs[Long]("v") == 333L && got.getAs[String]("extra") == "y",
      "positional resolution mapped and cast the columns in table order")
    intercept[Exception] {
      Seq((4L, 4L)).toDF("k", "v").write.format("graftstore").mode("append")
        .option("path", dir).option("keyCol", "k").save()
    }
  }
}
