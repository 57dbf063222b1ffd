package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** [[GraftCatalog]] — the name-typed SQL lifecycle over a warehouse of
  * versioned stores: DDL (namespace/table/show/drop/rename), the declared-
  * schema empty read, INSERT bootstrap + upsert, SQL `VERSION AS OF` /
  * `TIMESTAMP AS OF` resolution, `DELETE FROM` through SupportsDelete on a
  * catalog-qualified name, and the rename-preserves-history proof. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private val cat = "graft_spec_cat"
  private lazy val wh: String = {
    val w = Files.createTempDirectory("graft_cat_wh").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", w)
    spark.sql(s"CREATE NAMESPACE $cat.lake")
    w
  }

  private def mkTable(name: String): String = {
    spark.sql(
      s"""CREATE TABLE $cat.lake.$name (k BIGINT, v BIGINT, bucket INT)
         |USING graftstore
         |OPTIONS (keyCol 'k', bucketCol 'bucket', nBuckets '4')""".stripMargin)
    s"$wh/lake/$name"
  }

  private def insert(name: String, where: String = "TRUE"): Unit =
    spark.sql(
      s"""INSERT INTO $cat.lake.$name
         |SELECT id AS k, id * 10 AS v, CAST(id % 4 AS INT) AS bucket
         |FROM range(0, 32) WHERE $where""".stripMargin)

  test("CREATE TABLE declares schema; the empty table reads as zero rows") {
    wh
    mkTable("t_empty")
    val df = spark.sql(s"SELECT * FROM $cat.lake.t_empty")
    assert(df.columns.toSeq == Seq("k", "v", "bucket"))
    assert(df.count() == 0L)
    assert(spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getString(1)).contains("t_empty"))
  }

  test("INSERT bootstraps v1, a second INSERT upserts v2; VERSION AS OF serves both") {
    wh
    val dir = mkTable("t_tt")
    insert("t_tt")                       // v1: keys 0..31, v = 10k
    spark.sql(s"INSERT INTO $cat.lake.t_tt SELECT id, id * 70, " +
      "CAST(id % 4 AS INT) FROM range(0, 4)") // v2: keys 0..3 re-upserted ×7
    assert(Versioned.latestVersion(dir) == 2)
    val v1 = spark.sql(
      s"SELECT sum(v) FROM $cat.lake.t_tt VERSION AS OF 1").head().getLong(0)
    val v2 = spark.sql(
      s"SELECT sum(v) FROM $cat.lake.t_tt VERSION AS OF 2").head().getLong(0)
    val base = (0L until 32L).map(_ * 10).sum
    assert(v1 == base)
    assert(v2 == base + (0L until 4L).map(_ * 10 * 6).sum)
    // unqualified read serves latest
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t_tt").head().getLong(0) == v2)
  }

  test("TIMESTAMP AS OF resolves through the commit-time sidecars") {
    wh
    val dir = mkTable("t_ts")
    insert("t_ts")
    spark.sql(s"INSERT INTO $cat.lake.t_ts SELECT id, id * 70, " +
      "CAST(id % 4 AS INT) FROM range(0, 4)")
    Versioned.writeCommitTime(dir, 1, 1000000L)
    Versioned.writeCommitTime(dir, 2, 2000000L)
    val base = (0L until 32L).map(_ * 10).sum
    // the SQL surface end to end: Spark parses the literal in the session
    // timezone (UTC) and hands the catalog epoch MICROS
    val atV1 = spark.sql(s"SELECT sum(v) FROM $cat.lake.t_ts " +
      "TIMESTAMP AS OF '1970-01-01 00:00:01.5'").head().getLong(0)
    val atV2 = spark.sql(s"SELECT sum(v) FROM $cat.lake.t_ts " +
      "TIMESTAMP AS OF '1970-01-01 00:00:02.5'").head().getLong(0)
    assert(atV1 == base)
    assert(atV2 == base + (0L until 4L).map(_ * 10 * 6).sum)
  }

  test("DELETE FROM works on a catalog-qualified name") {
    wh
    mkTable("t_del")
    insert("t_del")
    spark.sql(s"DELETE FROM $cat.lake.t_del WHERE k IN (1, 2, 3)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_del").head().getLong(0) == 29L)
    // snapshot isolation: v1 still serves the doomed keys
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_del VERSION AS OF 1")
      .head().getLong(0) == 32L)
  }

  test("RENAME preserves the whole commit history") {
    wh
    mkTable("t_ren")
    insert("t_ren")
    spark.sql(s"INSERT INTO $cat.lake.t_ren SELECT id, id * 70, " +
      "CAST(id % 4 AS INT) FROM range(0, 4)")
    spark.sql(s"ALTER TABLE $cat.lake.t_ren RENAME TO lake.t_ren2")
    assert(!Files.exists(Paths.get(s"$wh/lake/t_ren")))
    val v1 = spark.sql(
      s"SELECT sum(v) FROM $cat.lake.t_ren2 VERSION AS OF 1").head().getLong(0)
    assert(v1 == (0L until 32L).map(_ * 10).sum)
  }

  test("ALTER TABLE ADD COLUMN is a schema-only commit: null-filled now, invisible pinned") {
    wh
    val dir = mkTable("t_alter")
    insert("t_alter")                                       // v1
    val dataDirsBefore = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    spark.sql(s"ALTER TABLE $cat.lake.t_alter ADD COLUMN extra BIGINT") // v2
    assert(Versioned.latestVersion(dir) == 2, "the ALTER is a COMMIT")
    // zero data IO: no new data directory exists for the schema commit
    val dataDirsAfter = Option(new java.io.File(s"$dir/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(dataDirsAfter == dataDirsBefore, "schema-only: no data was written")
    // current reads serve the column, null-filled
    val now = spark.sql(s"SELECT k, extra FROM $cat.lake.t_alter")
    assert(now.columns.toSeq == Seq("k", "extra"))
    assert(now.collect().forall(_.isNullAt(1)), "existing rows null-fill")
    // a pinned pre-ALTER read NEVER sees it (time-travel correctness)
    assert(!spark.sql(s"SELECT * FROM $cat.lake.t_alter VERSION AS OF 1")
      .columns.contains("extra"))
    // a later INSERT materializes values; untouched rows stay null
    spark.sql(s"INSERT INTO $cat.lake.t_alter SELECT id, id * 10, " +
      "CAST(id % 4 AS INT), id * 7 FROM range(0, 4)")       // v3
    val vals = spark.sql(s"SELECT k, extra FROM $cat.lake.t_alter")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(vals(0L) == 0L && vals(2L) == 14L && vals(5L) == -1L)
    // add-only discipline holds: duplicates, drops, renames stay refused
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.t_alter ADD COLUMN extra BIGINT") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.t_alter DROP COLUMN extra") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.lake.t_alter RENAME COLUMN extra TO e2") }
  }

  test("ALTER TABLE ADD COLUMN on a declared-only table widens the declared schema") {
    wh
    mkTable("t_alter_decl")
    spark.sql(s"ALTER TABLE $cat.lake.t_alter_decl ADD COLUMN note STRING")
    assert(spark.sql(s"SELECT * FROM $cat.lake.t_alter_decl").columns.toSeq ==
      Seq("k", "v", "bucket", "note"))
    // the bootstrap INSERT resolves against the widened declaration
    spark.sql(s"INSERT INTO $cat.lake.t_alter_decl SELECT id, id * 10, " +
      "CAST(id % 4 AS INT), concat('n', id) FROM range(0, 8)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_alter_decl " +
      "WHERE note = 'n3'").head().getLong(0) == 1L)
  }

  test("CTAS creates the table and bootstraps commit v1 in one statement") {
    wh
    spark.sql(
      s"""CREATE TABLE $cat.lake.t_ctas
         |USING graftstore
         |OPTIONS (keyCol 'k', bucketCol 'bucket', nBuckets '4')
         |AS SELECT id AS k, id * 10 AS v, CAST(id % 4 AS INT) AS bucket
         |FROM range(0, 32)""".stripMargin)
    assert(Versioned.latestVersion(s"$wh/lake/t_ctas") == 1)
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t_ctas").head().getLong(0)
      == (0L until 32L).map(_ * 10).sum)
  }

  test("CALL system.compact + vacuum: content invariant, fragments gone, history trimmed") {
    wh
    val dir = mkTable("t_proc")
    insert("t_proc")
    // v2: every key re-upserted — the anti-join's shuffle (4 partitions)
    // writes several files per bucket directory: the fragmenting commit
    spark.sql(s"INSERT INTO $cat.lake.t_proc SELECT id, id * 11, " +
      "CAST(id % 4 AS INT) FROM range(0, 32)")
    val before = spark.sql(s"SELECT sum(v) FROM $cat.lake.t_proc").head().getLong(0)
    val res = spark.sql(s"CALL $cat.system.compact('lake.t_proc')").collect()(0)
    assert(res.getInt(0) == 3) // the compaction commit's version
    assert(Versioned.latestVersion(dir) == 3)
    // invisibility: content identical, every live bucket now one file
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t_proc").head().getLong(0) == before)
    val m = Versioned.readManifest(dir, 3)
    assert(m.filter(_._2 > 0).forall { case (b, ver) =>
      new java.io.File(s"$dir/data/v$ver/bucket=$b")
        .listFiles().count(_.getName.endsWith(".parquet")) == 1
    })
    spark.sql(s"CALL $cat.system.vacuum('lake.t_proc', 1)").collect()
    assert(spark.sql(s"SELECT sum(v) FROM $cat.lake.t_proc").head().getLong(0) == before)
    // time travel to the vacuumed range is gone by design
    intercept[Exception] {
      spark.sql(s"SELECT sum(v) FROM $cat.lake.t_proc VERSION AS OF 1").collect()
    }
  }

  test("TRUNCATE TABLE on a catalog name is the pure-metadata empty commit") {
    wh
    val dir = mkTable("t_trunc")
    insert("t_trunc")
    spark.sql(s"TRUNCATE TABLE $cat.lake.t_trunc")
    assert(Versioned.latestVersion(dir) == 2) // truncate is a COMMIT
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_trunc").head().getLong(0) == 0L)
    // snapshot isolation: v1 still serves every row
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_trunc VERSION AS OF 1")
      .head().getLong(0) == 32L)
    // the emptied table keeps its schema and accepts new commits
    spark.sql(s"INSERT INTO $cat.lake.t_trunc SELECT id, id, " +
      "CAST(id % 4 AS INT) FROM range(0, 5)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_trunc").head().getLong(0) == 5L)
  }

  test("MERGE INTO composes with catalog-qualified names (GraftExtensions session)") {
    wh
    mkTable("t_merge")
    insert("t_merge")
    // MERGE resolution on a catalog table needs GraftMergeAnalysis, an
    // analyzer-injection — only reachable at session BUILD time, so build
    // a sibling session over the same context (SOMSpec's pattern)
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s2.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s2.sql(s"""MERGE INTO $cat.lake.t_merge
        |USING (SELECT id AS sk, id * 100 AS sv, CAST(id % 4 AS INT) AS sbucket
        |       FROM range(28, 34)) src
        |ON k = sk
        |WHEN MATCHED THEN UPDATE SET v = sv
        |WHEN NOT MATCHED THEN INSERT (k, v, bucket) VALUES (sk, sv, sbucket)
        |""".stripMargin)
      val rows = s2.sql(s"SELECT k, v FROM $cat.lake.t_merge WHERE k >= 28")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows == Map(28L -> 2800L, 29L -> 2900L, 30L -> 3000L,
        31L -> 3100L, 32L -> 3200L, 33L -> 3300L))
      assert(s2.sql(s"SELECT count(*) FROM $cat.lake.t_merge").head().getLong(0) == 34L)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the source's extra column through the schema commit") {
    wh
    val dir = mkTable("t_mevo")
    insert("t_mevo")                                          // v1
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s2.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s2.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $cat.lake.t_mevo t
        |USING (SELECT id AS k, id * 100 AS v, CAST(id % 4 AS INT) AS bucket,
        |       concat('n', id) AS note FROM range(30, 34)) src
        |ON t.k = src.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // v2 = the analyzer-routed ALTER (schema-only), v3 = the merge commit
      assert(Versioned.latestVersion(dir) == 3)
      val rows = s2.sql(s"SELECT k, v, note FROM $cat.lake.t_mevo WHERE k >= 29")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2))).toMap
      assert(rows(29L) == ((290L, null)), "untouched rows null-fill the evolved column")
      assert(rows(30L) == ((3000L, "n30")) && rows(33L) == ((3300L, "n33")))
      // pinned pre-merge read never sees the evolved column
      assert(!s2.sql(s"SELECT * FROM $cat.lake.t_mevo VERSION AS OF 1")
        .columns.contains("note"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("UPDATE on a catalog-qualified name resolves and commits (r15 verdict pin)") {
    wh
    val dir = mkTable("t_upd")
    insert("t_upd")
    import org.apache.spark.sql.SparkSession
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      s2.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
      s2.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s2.sql(s"UPDATE $cat.lake.t_upd SET v = v + 1 WHERE k % 4 = 2")
      assert(Versioned.latestVersion(dir) == 2)
      val rows = s2.sql(s"SELECT k, v FROM $cat.lake.t_upd")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(2L) == 21L && rows(6L) == 61L && rows(3L) == 30L)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("TRUNCATE then vacuum degrades to a clear retention error, not a raw crash") {
    wh
    mkTable("t_tv")
    insert("t_tv")
    spark.sql(s"TRUNCATE TABLE $cat.lake.t_tv")                 // v2: all-sentinel
    spark.sql(s"CALL $cat.system.vacuum('lake.t_tv', 1)").collect() // drops v1
    // every data-holding donor is vacuumed: reads and inserts must fail
    // with the retention message, never a NoSuchFileException
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    val eRead = intercept[Exception] {
      spark.sql(s"SELECT * FROM $cat.lake.t_tv").collect()
    }
    assert(chain(eRead).exists(_.contains("vacuum")), chain(eRead).mkString(" | "))
    val eIns = intercept[Exception] { insert("t_tv") }
    assert(chain(eIns).exists(_.contains("vacuum")), chain(eIns).mkString(" | "))
  }

  test("an arity-matched positional INSERT works on an evolveSchema table") {
    wh
    spark.sql(
      s"""CREATE TABLE $cat.lake.t_evpos (k BIGINT, v BIGINT, bucket INT)
         |USING graftstore
         |OPTIONS (keyCol 'k', bucketCol 'bucket', nBuckets '4',
         |         evolveSchema 'true')""".stripMargin)
    insert("t_evpos")
    // VALUES columns are named col1/col2/col3 — the positional path; the
    // table-level evolution opt-in must not reject an ordinary insert
    spark.sql(s"INSERT INTO $cat.lake.t_evpos VALUES (200, 2000, 0)")
    assert(spark.sql(s"SELECT v FROM $cat.lake.t_evpos WHERE k = 200")
      .head().getLong(0) == 2000L)
    // positional EVOLUTION (extra unnamed column) still refuses by-name-only
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.lake.t_evpos VALUES (201, 2010, 0, 9)")
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("BY NAME")), chain(e).mkString(" | "))
  }

  test("CALL system.write_stats records the skipping sidecars") {
    wh
    val dir = mkTable("t_stats")
    insert("t_stats")
    assert(!Versioned.hasStats(dir, 1) && !Versioned.hasRowCounts(dir, 1))
    val res = spark.sql(s"CALL $cat.system.write_stats('lake.t_stats', 'v')")
      .collect()(0)
    assert(res.getInt(0) == 1 && res.getString(1) == "v")
    assert(Versioned.hasStats(dir, 1) && Versioned.hasRowCounts(dir, 1))
    assert(Versioned.readRowCounts(dir, 1).values.sum == 32L)
  }

  test("INSERT OVERWRITE on a catalog name is a rewrite COMMIT; old versions time travel") {
    wh
    val dir = mkTable("t_ovr")
    insert("t_ovr")
    spark.sql(s"INSERT OVERWRITE $cat.lake.t_ovr SELECT id, id * 5, " +
      "CAST(id % 4 AS INT) FROM range(0, 10)")
    assert(Versioned.latestVersion(dir) == 2) // overwrite is a commit, not an erase
    assert(spark.sql(s"SELECT count(*), sum(v) FROM $cat.lake.t_ovr").head()
      match { case r => r.getLong(0) == 10L && r.getLong(1) == (0L until 10L).map(_ * 5).sum })
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.t_ovr VERSION AS OF 1")
      .head().getLong(0) == 32L, "the pre-overwrite snapshot still serves")
  }

  test("CALL system.history: the commit log as rows; vacuum and clone edges pinned") {
    wh
    val dir = mkTable("t_hist")
    insert("t_hist")                                              // v1 BASE
    spark.sql(s"INSERT INTO $cat.lake.t_hist SELECT id, id * 70, " +
      "CAST(id % 4 AS INT) FROM range(0, 2)")                     // v2 DELTA (buckets 0,1)
    spark.sql(s"ALTER TABLE $cat.lake.t_hist ADD COLUMN extra BIGINT") // v3 ALTER
    Versioned.writeCommitTime(dir, 1, 1000000L)
    spark.sql(s"TRUNCATE TABLE $cat.lake.t_hist")                 // v4 TRUNCATE
    def hist(): Map[Int, (String, Option[Int], Int)] =
      spark.sql(s"CALL $cat.system.history('lake.t_hist')").collect()
        .map(r => r.getInt(0) -> ((r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getInt(2)), r.getInt(3)))).toMap
    val h = hist()
    assert(h(1) == (("BASE", Some(4), 4)))
    assert(h(2) == (("DELTA", Some(2), 4)), "the two-bucket upsert diff")
    assert(h(3) == (("ALTER", Some(0), 4)), "schema-only: zero buckets moved")
    assert(h(4) == (("TRUNCATE", Some(4), 0)), "all buckets to the sentinel")
    // time and txn surface when stamped
    val v1row = spark.sql(s"CALL $cat.system.history('lake.t_hist')")
      .collect().find(_.getInt(0) == 1).get
    assert(v1row.getLong(5) == 1000000L)
    // vacuum edge: v3's diff basis survives classification via its sidecar;
    // a DELTA whose predecessor is vacuumed degrades to UNKNOWN, not a guess
    spark.sql(s"CALL $cat.system.vacuum('lake.t_hist', 3)").collect() // drops v1
    val hv = hist()
    assert(!hv.contains(1) && hv(3)._1 == "ALTER")
    assert(hv(2) == (("UNKNOWN", None, 4)), "vacuumed diff basis: no guess")
    // clone edge: a shallow clone's history starts at its own v1 BASE,
    // live buckets counted through the external references
    val cloneDir = s"$wh/lake/t_hist_clone"
    val srcDir = mkTable("t_hist_src")
    insert("t_hist_src")
    Versioned.cloneShallow(srcDir, cloneDir, 1)
    val hc = spark.sql(s"CALL $cat.system.history('lake.t_hist_clone')").collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getInt(3)))).toMap
    assert(hc == Map(1 -> (("BASE", 4))))
  }

  test("DROP TABLE removes the store; SHOW TABLES no longer lists it") {
    wh
    mkTable("t_drop")
    insert("t_drop")
    spark.sql(s"DROP TABLE $cat.lake.t_drop")
    assert(!spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getString(1)).contains("t_drop"))
    assert(!Files.exists(Paths.get(s"$wh/lake/t_drop")))
  }
}
