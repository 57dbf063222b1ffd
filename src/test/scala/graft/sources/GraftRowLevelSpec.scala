package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL row-level DML on the store ([[GraftRowLevelRewrite]] +
  * `SupportsDelete`): MERGE/UPDATE/DELETE semantics, the SQL MERGE
  * cardinality rule, key-moving updates, statement idempotence, snapshot
  * isolation, and the untouched-bucket byte-identity contract every
  * copy-on-write commit carries. */
class GraftRowLevelSpec extends SparkSpec {
  import spark.implicits._

  if (!spark.experimental.extraOptimizations.contains(GraftRowLevelRewrite))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ GraftRowLevelRewrite

  private var n = 0
  private def stage(): (String, String) = {
    val dir = Files.createTempDirectory("graft_rowlevel").toString
    n += 1
    val view = s"grl_t$n"
    val base = (0L until 100L).map(k => (k, (k % 4).toInt, k * 1.0))
      .toDF("k", "bucket", "payload")
    Versioned.commitBase(base, dir, "bucket", 4)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $view USING graftstore " +
      s"OPTIONS (path '$dir', keyCol 'k')")
    (dir, view)
  }
  private def state(dir: String, v: Int): Map[Long, Double] =
    Versioned.readVersion(spark, dir, v)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("payload")).toMap

  test("DELETE FROM ... IN: doomed keys gone at v2, v1 intact, untouched buckets byte-identical") {
    val (dir, view) = stage()
    val before = new java.io.File(s"$dir/data/v1/bucket=2").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    spark.sql(s"DELETE FROM $view WHERE k IN (1, 5, 13)") // all bucket 1
    val v2 = state(dir, 2)
    assert(!v2.contains(1L) && !v2.contains(5L) && !v2.contains(13L))
    assert(v2.size == 97)
    assert(state(dir, 1).size == 100, "snapshot isolation: v1 still serves")
    // only bucket 1 rewritten: the manifest copies every other pointer
    val m = Versioned.readManifest(dir, 2)
    assert(m(1) == 2 && Seq(0, 2, 3).forall(m(_) == 1))
    val after = new java.io.File(s"$dir/data/v1/bucket=2").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    assert(before == after, "untouched bucket bytes never touched")
  }

  test("DELETE FROM with no predicate: metadata-only full delete, schema preserved") {
    val (dir, view) = stage()
    val v1Files = new java.io.File(s"$dir/data/v1").listFiles().length
    spark.sql(s"DELETE FROM $view")
    assert(Versioned.readManifest(dir, 2).values.forall(_ == 0))
    assert(spark.table(view).count() == 0)
    assert(spark.table(view).columns.toSet == Set("k", "bucket", "payload"),
      "an empty table is still a table with columns")
    assert(new java.io.File(s"$dir/data/v1").listFiles().length == v1Files &&
      !new java.io.File(s"$dir/data/v2").exists(),
      "full delete writes no data files at all")
  }

  test("DELETE with an unsupported predicate shape fails loud, commits nothing") {
    val (dir, view) = stage()
    intercept[Exception] { spark.sql(s"DELETE FROM $view WHERE payload > 5.0") }
    assert(Versioned.latestVersion(dir) == 1, "no partial commit")
  }

  test("UPDATE: assigned rows change, others carry, one commit, non-key predicate works") {
    val (dir, view) = stage()
    spark.sql(s"UPDATE $view SET payload = payload + 0.5 WHERE k % 10 = 3")
    val v2 = state(dir, 2)
    assert(v2(3L) == 3.5 && v2(13L) == 13.5 && v2(4L) == 4.0)
    assert(v2.size == 100)
    assert(Versioned.latestVersion(dir) == 2)
  }

  test("UPDATE that moves the key: old key deleted, new key present (D+U algebra)") {
    val (dir, view) = stage()
    spark.sql(s"UPDATE $view SET k = k + 1000 WHERE k = 7")
    val v2 = state(dir, 2)
    assert(!v2.contains(7L), "the old key must not survive as a duplicate")
    assert(v2(1007L) == 7.0)
    assert(v2.size == 100)
  }

  test("MERGE: first-match-wins conditions, matched DELETE/UPDATE, INSERT, NOT MATCHED BY SOURCE") {
    val (dir, view) = stage()
    Seq((1L, 1, -1.0, 1), (2L, 2, -2.0, 0), (200L, 0, 9.0, 0))
      .toDF("k", "bucket", "payload", "is_del").createOrReplaceTempView("grl_src")
    spark.sql(
      s"""MERGE INTO $view t USING grl_src s ON t.k = s.k
         |WHEN MATCHED AND s.is_del = 1 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET payload = s.payload
         |WHEN NOT MATCHED THEN INSERT (k, bucket, payload)
         |  VALUES (s.k, s.bucket, s.payload)
         |WHEN NOT MATCHED BY SOURCE AND t.k >= 95 THEN DELETE""".stripMargin)
    val v2 = state(dir, 2)
    assert(!v2.contains(1L), "flagged matched row deleted (first match wins)")
    assert(v2(2L) == -2.0, "second matched action updates the unflagged row")
    assert(v2(200L) == 9.0, "not-matched inserts")
    assert((95L to 99L).forall(k => !v2.contains(k)), "not-matched-by-source deletes")
    assert(v2.size == 100 - 1 + 1 - 5)
  }

  test("MERGE UPDATE SET * / INSERT * with an extra source column; statement idempotence") {
    val (dir, view) = stage()
    (Seq((3L, 3, 333.0, 0), (300L, 0, 300.0, 0)))
      .toDF("k", "bucket", "payload", "extra").createOrReplaceTempView("grl_src2")
    def run() = spark.sql(
      s"""MERGE INTO $view USING grl_src2 ON $view.k = grl_src2.k
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    run()
    val v2 = state(dir, 2)
    assert(v2(3L) == 333.0 && v2(300L) == 300.0 && v2.size == 101)
    run() // re-running the same MERGE converges (a second commit, same state)
    assert(state(dir, 3) == v2, "MERGE of the same source is idempotent on state")
  }

  test("MERGE cardinality violation fails loud; nothing commits") {
    val (dir, view) = stage()
    Seq((4L, 0, 1.0), (4L, 0, 2.0)).toDF("k", "bucket", "payload")
      .createOrReplaceTempView("grl_dup")
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO $view USING grl_dup ON $view.k = grl_dup.k " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(e.getMessage.contains("cardinality"))
    assert(Versioned.latestVersion(dir) == 1)
  }

  test("key-rewriting UPDATE mapping two rows onto one key fails loud; nothing commits") {
    val (dir, view) = stage()
    // k ∈ {1, 5} both become k = 1000: committing would write TWO rows of
    // one key — the silent invariant break the duplicate-key guard bans
    // (the UPDATE-side sibling of the MERGE cardinality rule)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $view SET k = 1000 WHERE k IN (1, 5)")
    }
    assert(e.getMessage.contains("ONE row per"))
    assert(Versioned.latestVersion(dir) == 1, "the rejected UPDATE committed nothing")
    // a key-rewrite with UNIQUE new keys still works
    spark.sql(s"UPDATE $view SET k = k + 1000 WHERE k IN (1, 5)")
    val v2 = state(dir, 2)
    assert(v2.contains(1001L) && v2.contains(1005L) &&
      !v2.contains(1L) && !v2.contains(5L) && v2.size == 100)
  }

  test("key-moving UPDATE onto an existing untargeted key fails loud (r16 guard)") {
    val (dir, view) = stage()
    // UPDATE ... SET k = 2 WHERE k = 1 while k=2 exists untouched: the
    // commit would silently REPLACE row 2 — a row the statement never
    // targeted (the ADVICE lost-update scenario). The guard fails loud.
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $view SET k = 2 WHERE k = 1")
    }
    assert(e.getMessage.contains("untargeted"))
    assert(Versioned.latestVersion(dir) == 1, "the rejected UPDATE committed nothing")
    // SWAP-SHAPED moves stay legal: every landed-on key is itself moved
    // away by the same statement (its old key rides the D rows)
    spark.sql(s"UPDATE $view SET k = CASE WHEN k = 1 THEN 5 ELSE 1 END " +
      "WHERE k IN (1, 5)")
    val v2 = state(dir, 2)
    assert(v2(5L) == 1.0 && v2(1L) == 5.0 && v2.size == 100)
  }

  test("MERGE whose ON is not the key: insert aliasing a live key fails loud") {
    val (dir, view) = stage()
    // source row has payload no target row carries (so NOT MATCHED fires)
    // but its key k=7 IS a live row — the insert would silently replace it
    Seq((7L, 3, -777.0)).toDF("k", "bucket", "payload")
      .createOrReplaceTempView("grl_alias_src")
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $view t USING grl_alias_src s ON t.payload = s.payload
           |WHEN NOT MATCHED THEN INSERT (k, bucket, payload)
           |  VALUES (s.k, s.bucket, s.payload)""".stripMargin)
    }
    assert(e.getMessage.contains("untargeted"))
    assert(Versioned.latestVersion(dir) == 1)
  }

  test("row-level DML through a version-pinned view is rejected") {
    val (dir, _) = stage()
    spark.sql(s"DELETE FROM grl_t$n WHERE k IN (1)") // advance to v2 first
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW grl_pinned USING graftstore " +
      s"OPTIONS (path '$dir', keyCol 'k', versionAsOf '1')")
    intercept[Exception] { spark.sql("DELETE FROM grl_pinned WHERE k IN (2)") }
    intercept[Exception] { spark.sql("UPDATE grl_pinned SET payload = 0.0") }
    assert(Versioned.latestVersion(dir) == 2, "the pinned view committed nothing")
  }
}
