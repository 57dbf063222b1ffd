package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The versioned snapshot store: snapshot isolation, copy-on-write at
  * bucket granularity, time travel through chained commits. */
class VersionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_versioned").toString

  private def files(dir: String, ver: Int, bucket: Int): Map[String, (Long, Long)] = {
    val d = new java.io.File(s"$dir/data/v$ver/bucket=$bucket")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length, f.lastModified)).toMap
  }

  test("copy-on-write commits; old versions stay readable and byte-identical") {
    val dir = tmp()
    // keys 0..39 in 4 buckets; value = key
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    val untouched0 = files(dir, 1, 2) ++ files(dir, 1, 3)
    assert(untouched0.nonEmpty)

    // v2: update keys 0 and 4 (bucket 0), insert key 101 (bucket 1)
    val delta2 = Seq((0L, 1000L, 0), (4L, 1004L, 0), (101L, 101L, 1))
      .toDF("k", "v", "bucket")
    Versioned.commitUpsert(spark, delta2, dir, 2, "k", "bucket")

    // v1 unchanged through the manifest; untouched buckets not rewritten
    val v1 = Versioned.readVersion(spark, dir, 1)
    assert(v1.count() == 40)
    assert(v1.agg(sum("v")).head().getLong(0) == (0L until 40L).sum)
    assert(files(dir, 1, 2) ++ files(dir, 1, 3) == untouched0,
      "buckets without changed keys must not be rewritten")
    assert(Versioned.readManifest(dir, 2) ==
      Map(0 -> 2, 1 -> 2, 2 -> 1, 3 -> 1))

    // v2 content: 41 rows, two updates, one insert
    val v2 = Versioned.readVersion(spark, dir, 2)
    assert(v2.count() == 41)
    assert(v2.where(col("k") === 0).head().getLong(1) == 1000L)
    assert(v2.where(col("k") === 101).count() == 1)
    assert(v2.where(col("k") === 1).head().getLong(1) == 1L)

    // v3 touches only bucket 3 — a three-version manifest chain
    val delta3 = Seq((3L, 3000L, 3)).toDF("k", "v", "bucket")
    Versioned.commitUpsert(spark, delta3, dir, 3, "k", "bucket")
    assert(Versioned.readManifest(dir, 3) ==
      Map(0 -> 2, 1 -> 2, 2 -> 1, 3 -> 3))
    val v3 = Versioned.readVersion(spark, dir, 3)
    assert(v3.count() == 41)
    assert(v3.where(col("k") === 3).head().getLong(1) == 3000L)
    assert(v3.where(col("k") === 0).head().getLong(1) == 1000L, "v2 change carries")
    // every older version still reads exactly as committed
    assert(Versioned.readVersion(spark, dir, 2).where(col("k") === 3)
      .head().getLong(1) == 3L)
    assert(Versioned.readVersion(spark, dir, 1).agg(sum("v")).head()
      .getLong(0) == (0L until 40L).sum)

    // v4: SCHEMA EVOLUTION — the delta carries a new column `w`
    val delta4 = Seq((5L, 5000L, 1, "x")).toDF("k", "v", "bucket", "w")
    Versioned.commitUpsert(spark, delta4, dir, 4, "k", "bucket")
    val v4 = Versioned.readVersion(spark, dir, 4)
    assert(v4.columns.contains("w"))
    assert(v4.count() == 41)
    assert(v4.where(col("k") === 5).head().getAs[String]("w") == "x")
    // rows from pre-evolution files null-fill the new column
    assert(v4.where(col("k") === 6).head().getAs[String]("w") == null)
    assert(v4.where(col("w").isNotNull).count() == 1)
    // a reader pinned BEFORE the evolution never sees the new column
    assert(!Versioned.readVersion(spark, dir, 3).columns.contains("w"))
    // untouched buckets still not rewritten by the evolving commit
    assert(files(dir, 1, 2) ++ files(dir, 1, 3) == untouched0)

    // v5: an EMPTY delta commits a manifest copy (no gap in the version
    // chain — a streaming applier's trailing empty batch must not strand
    // the next commit's v-1 lookup)
    val empty = Seq.empty[(Long, Long, Int, String)].toDF("k", "v", "bucket", "w")
    Versioned.commitUpsert(spark, empty, dir, 5, "k", "bucket")
    assert(Versioned.latestVersion(dir) == 5)
    assert(Versioned.readManifest(dir, 5) == Versioned.readManifest(dir, 4))
    assert(Versioned.readVersion(spark, dir, 5).count() == 41)

    // VACUUM keeping the last 2 versions (4, 5). Liveness is "referenced
    // by a kept manifest": v1 wrote buckets 2 and 3, and bucket 2 is STILL
    // what v5 points at — its files must survive v1's retirement; v1's
    // bucket 0/1 dirs (superseded by v2/v4) must go, as must all of v2's
    // bucket 0 (superseded? no — v5 manifest is {0->2, 1->4, 2->1, 3->3}):
    // kept live set = v2/b0, v4/b1, v1/b2, v3/b3.
    Versioned.vacuum(dir, keep = 2)
    assert(Versioned.latestVersion(dir) == 5)
    assert(!Versioned.hasVersion(dir, 1) && !Versioned.hasVersion(dir, 3))
    assert(Versioned.hasVersion(dir, 4) && Versioned.hasVersion(dir, 5))
    // still-referenced old-version bucket dirs survive
    assert(new java.io.File(s"$dir/data/v1/bucket=2").exists)
    assert(new java.io.File(s"$dir/data/v3/bucket=3").exists)
    assert(new java.io.File(s"$dir/data/v2/bucket=0").exists)
    assert(new java.io.File(s"$dir/data/v4/bucket=1").exists)
    // unreferenced dirs are gone
    assert(!new java.io.File(s"$dir/data/v1/bucket=0").exists)
    assert(!new java.io.File(s"$dir/data/v1/bucket=1").exists)
    assert(!new java.io.File(s"$dir/data/v1/bucket=3").exists)
    assert(!new java.io.File(s"$dir/data/v2/bucket=1").exists)
    // the kept versions read exactly as before
    val v5r = Versioned.readVersion(spark, dir, 5)
    assert(v5r.count() == 41)
    assert(v5r.where(col("k") === 5).head().getAs[String]("w") == "x")
    assert(v5r.where(col("k") === 3).head().getLong(1) == 3000L)

    // v6: DELETE commit — two keys from bucket 0, and bucket 2 ENTIRELY
    // (all ten of its keys: 2, 6, ..., 38)
    val bucket2 = (0L until 40L).filter(_ % 4 == 2)
    val doomed = (Seq(0L, 4L) ++ bucket2).map(k => (k, (k % 4).toInt))
      .toDF("k", "bucket")
    Versioned.commitDelete(spark, doomed, dir, 6, "k", "bucket")
    val v6 = Versioned.readVersion(spark, dir, 6)
    assert(v6.count() == 29)
    assert(v6.where(col("k").isin(Seq(0L, 4L) ++ bucket2: _*)).count() == 0)
    // bucket 2 was fully doomed -> the empty sentinel, not a stale pointer
    assert(Versioned.readManifest(dir, 6)(2) == 0)
    assert(v6.where(col("bucket") === 2).count() == 0)
    // untouched buckets still never rewritten; pre-delete versions still
    // SERVE the deleted rows (snapshot isolation — the full forget is
    // commitDelete + vacuum expiring pre-delete versions)
    assert(Versioned.readVersion(spark, dir, 5).where(col("k") === 0).count() == 1)
    Versioned.vacuum(dir, keep = 1)
    assert(!Versioned.hasVersion(dir, 5))
    assert(!new java.io.File(s"$dir/data/v1/bucket=2").exists,
      "after retention expiry the deleted bucket's files are physically gone")
    assert(Versioned.readVersion(spark, dir, 6).count() == 29)
  }

  test("zone maps: stats-range reads prune buckets; results equal the full filter") {
    val dir = tmp()
    // disjoint value bands per bucket so pruning has teeth
    val base = (0L until 40L).map(k => (k, (k % 4) * 1000 + k, (k % 4).toInt))
      .toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.writeStats(spark, dir, 1, "v")
    assert(Versioned.readStats(dir, 1)(1) == (1001L, 1037L))

    val (d1, read1) = Versioned.readVersionWhere(spark, dir, 1, "v", 1000, 1999)
    assert(read1 == Set(1), s"only bucket 1 overlaps: $read1")
    assert(d1.count() == base.where(col("v").between(1000, 1999)).count())

    val (d2, read2) = Versioned.readVersionWhere(spark, dir, 1, "v", 1010, 2010)
    assert(read2 == Set(1, 2))
    assert(d2.count() == base.where(col("v").between(1010, 2010)).count())

    // a range nothing overlaps reads no bucket and returns empty
    val (d0, read0) = Versioned.readVersionWhere(spark, dir, 1, "v", 50000, 60000)
    assert(read0.isEmpty && d0.count() == 0)

    // stats survive a copy-on-write commit: recompute for v2, old stats kept
    val delta = Seq((1L, 9999L, 1)).toDF("k", "v", "bucket")
    Versioned.commitUpsert(spark, delta, dir, 2, "k", "bucket")
    Versioned.writeStats(spark, dir, 2, "v")
    val (d3, read3) = Versioned.readVersionWhere(spark, dir, 2, "v", 9000, 10000)
    assert(read3 == Set(1) && d3.count() == 1)
    // the v1 zone maps still serve v1 reads unchanged
    val (d4, read4) = Versioned.readVersionWhere(spark, dir, 1, "v", 9000, 10000)
    assert(read4.isEmpty && d4.count() == 0)
  }

  test("bloom index: point lookups skip buckets, never miss, and FP buckets stay empty") {
    val dir = tmp()
    // keys spread uniformly over 8 buckets by a NON-key-derived column
    // order (bucket = k mod 8 here, but the index never assumes it — it
    // tests every bucket's filter)
    val base = (0L until 400L).map(k => (k, s"p$k", (k % 8).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 8)
    Versioned.writeBloomIndex(spark, dir, 1, "k")

    // present probes: 3 keys in 3 distinct buckets
    val present = Seq(8L, 17L, 26L)
    val (d1, read1) = Versioned.lookupKeys(spark, dir, 1, "k", present)
    val got = d1.select(col("k"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == present.map(k => k -> s"p$k").toMap,
      s"present probes must all be found exactly: $got")
    assert(read1.subsetOf((0 until 8).toSet) && read1.size < 8,
      s"lookup must skip buckets: read $read1")
    assert(Set(0, 1, 2).subsetOf(read1),
      s"true buckets of present keys must be read: $read1")

    // absent probes: beyond the key space — at 16+ bits/key nearly every
    // bucket should be skipped, and ANY false-positive bucket read must
    // yield zero rows (the exact filter empties it)
    val absent = Seq(4000L, 4001L, 4002L, 4003L)
    val (d0, read0) = Versioned.lookupKeys(spark, dir, 1, "k", absent)
    assert(d0.count() == 0, "absent probes must return no rows")
    assert(read0.size <= 2, s"absent-only batch read too many buckets: $read0")

    // the index survives a copy-on-write commit: rebuild for v2 after a
    // delta adds a brand-new key; the v1 index still serves v1 state
    val delta = Seq((1000L, "new", 0)).toDF("k", "payload", "bucket")
    Versioned.commitUpsert(spark, delta, dir, 2, "k", "bucket")
    Versioned.writeBloomIndex(spark, dir, 2, "k")
    val (d2, read2) = Versioned.lookupKeys(spark, dir, 2, "k", Seq(1000L))
    assert(d2.count() == 1 && read2.contains(0),
      s"new key must be found in v2: read=$read2")
    val (d3, _) = Versioned.lookupKeys(spark, dir, 1, "k", Seq(1000L))
    assert(d3.count() == 0, "v1 lookup must not see the v2 key")
  }

  test("commitMerge: mixed U/D ops in ONE commit — update, insert, delete, sentinel, untouched files intact") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, s"p$k", (k % 4).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    val before = files(dir, 1, 3)

    // one batch: update k=0 (bucket 0), insert k=100 (bucket 0), delete
    // k=1 (bucket 1), delete ALL of bucket 2's keys (sentinel); bucket 3
    // untouched
    val b2Keys = (0L until 40L).filter(_ % 4 == 2)
    val changes = (Seq((0L, "updated", 0, "U"), (100L, "new", 0, "U"),
        (1L, "", 1, "D")) ++ b2Keys.map(k => (k, "", 2, "D")))
      .toDF("k", "payload", "bucket", "op")
    Versioned.commitMerge(spark, changes, dir, 2, "k", "bucket")

    val v2 = Versioned.readVersion(spark, dir, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2(0L) == "updated" && v2(100L) == "new", "U ops must update+insert")
    assert(!v2.contains(1L), "D op must delete")
    assert(b2Keys.forall(k => !v2.contains(k)), "bucket 2 must be emptied")
    assert(v2.size == 40 - 1 - b2Keys.size + 1)
    // one commit: exactly one new version; bucket 2 is the empty sentinel
    val manifest = Versioned.readManifest(dir, 2)
    assert(manifest(2) == 0, "fully-deleted bucket must map to the sentinel")
    assert(manifest(3) == 1 && files(dir, 1, 3) == before,
      "untouched bucket's files must remain the v1 files, byte-identical")
    assert(manifest(0) == 2 && manifest(1) == 2)
    // v1 still serves the pre-merge state (snapshot isolation)
    assert(Versioned.readVersion(spark, dir, 1).count() == 40)
  }

  test("changes: net CDF — I/U/D ops, copied-forward rows excluded, untouched buckets unread") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, s"p$k", (k % 4).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    // v2: update k=0, insert k=100 (both bucket 0 — bucket 0's OTHER
    // nine keys are copied forward unchanged), insert-then-delete victim
    // k=101 lands in bucket 1
    Versioned.commitUpsert(spark,
      Seq((0L, "upd", 0), (100L, "new", 0), (101L, "doomed", 1))
        .toDF("k", "payload", "bucket"), dir, 2, "k", "bucket")
    // v3: delete k=101 (bucket 1) and k=2 (bucket 2)
    Versioned.commitDelete(spark,
      Seq((101L, 1), (2L, 2)).toDF("k", "bucket"), dir, 3, "k", "bucket")

    val (cdf13, touched13) = Versioned.changes(spark, dir, 1, 3, "k")
    val rows = cdf13.select("op", "k", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows == Set(("U", 0L, "upd"), ("I", 100L, "new"), ("D", 2L, "p2")),
      s"net window: doomed insert invisible, copied-forward rows absent; got $rows")
    assert(touched13 == Set(0, 1, 2), "bucket 3 was never rewritten — no IO")

    // the per-commit granularity: the doomed insert IS visible in (1,2]
    val (cdf12, _) = Versioned.changes(spark, dir, 1, 2, "k")
    val ops12 = cdf12.select("op", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops12 == Set(("U", 0L), ("I", 100L), ("I", 101L)))
    val (cdf23, touched23) = Versioned.changes(spark, dir, 2, 3, "k")
    val ops23 = cdf23.select("op", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ops23 == Set(("D", 101L), ("D", 2L)) && touched23 == Set(1, 2))

    // D-row payloads come from the OLD snapshot (v2's value for k=101)
    val dPayload = cdf23.where(col("k") === 101L).select("payload")
      .head().getString(0)
    assert(dPayload == "doomed")

    // an empty window (identical manifests) yields an empty feed
    Versioned.commitUpsert(spark,
      spark.emptyDataFrame
        .withColumn("k", lit(0L)).withColumn("payload", lit(""))
        .withColumn("bucket", lit(0)).where(lit(false)),
      dir, 4, "k", "bucket")
    val (cdf34, touched34) = Versioned.changes(spark, dir, 3, 4, "k")
    assert(cdf34.count() == 0 && touched34.isEmpty)
  }

  test("per-commit change feeds FOLD to the final snapshot (the CDF-consumer contract)") {
    val dir = tmp()
    val base = (0L until 60L).map(k => (k, s"p$k", (k % 4).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    Versioned.commitUpsert(spark,
      Seq((1L, "u1", 1), (200L, "n200", 0)).toDF("k", "payload", "bucket"),
      dir, 2, "k", "bucket")
    Versioned.commitDelete(spark,
      Seq((2L, 2), (200L, 0)).toDF("k", "bucket"), dir, 3, "k", "bucket")

    // fold: state ⊕ feed = (state minus feed keys) ∪ (feed I/U rows)
    def fold(state: DataFrame, feed: DataFrame): DataFrame = {
      val keys = feed.select(col("k")).distinct()
      state.join(keys, Seq("k"), "left_anti")
        .unionByName(feed.where(col("op") =!= "D").drop("op"))
    }
    val folded = (2 to 3).foldLeft(Versioned.readVersion(spark, dir, 1)) {
      (st, v) => fold(st, Versioned.changes(spark, dir, v - 1, v, "k")._1)
    }
    val want = Versioned.readVersion(spark, dir, 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = folded.select("k", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, "replaying per-commit feeds must reproduce the snapshot")
  }

  test("compaction rewrites only fragmented buckets; content identical; old layout still travels") {
    val dir = tmp()
    // three ingest stripes, each its own input partition → every bucket
    // dir collects one file per stripe; bucket 1 is forced single-stripe
    // (the already-compact control)
    val base = (0L until 120L)
      .map(k => (k, s"p$k", (k % 4).toInt,
        if (k % 4 == 1) 0 else ((k / 4) % 3).toInt))
      .toDF("k", "payload", "bucket", "stripe")
    // range partitioning: 3 distinct stripe values + 3 partitions → one
    // value per partition (hash mod N can collide all three into one)
    Versioned.commitBase(base.repartitionByRange(3, col("stripe")), dir, "bucket", 4)
    assert(Versioned.parquetFileCount(dir, 1, 1) == 1)
    Seq(0, 2, 3).foreach(b => assert(Versioned.parquetFileCount(dir, 1, b) > 1))

    val before = Versioned.readVersion(spark, dir, 1)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b1Before = files(dir, 1, 1)

    val rewritten = Versioned.commitCompact(spark, dir, 2, "bucket")
    assert(rewritten == Set(0, 2, 3), "only fragmented buckets rewrite")
    val mf2 = Versioned.readManifest(dir, 2)
    assert(mf2(1) == 1, "compact bucket's pointer copies forward")
    assert(files(dir, 1, 1) == b1Before, "compact bucket's bytes untouched")
    Seq(0, 2, 3).foreach(b => assert(Versioned.parquetFileCount(dir, 2, b) == 1,
      s"bucket $b must compact to one file"))

    val after = Versioned.readVersion(spark, dir, 2)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "compaction is invisible to readers")
    // time travel still serves the fragmented layout
    assert(Versioned.readVersion(spark, dir, 1).count() == 120)

    // compacting a compact store is a pointer-copy no-op commit
    assert(Versioned.commitCompact(spark, dir, 3, "bucket").isEmpty)
    assert(Versioned.readManifest(dir, 3) == mf2)
  }

  test("AS OF TIMESTAMP resolves to the latest commit at-or-before; edges fail loudly") {
    val dir = tmp()
    val base = (0L until 8L).map(k => (k, s"p$k", (k % 2).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    Versioned.commitUpsert(spark, Seq((1L, "u1", 1)).toDF("k", "payload", "bucket"),
      dir, 2, "k", "bucket")
    Versioned.writeCommitTime(dir, 1, 1000L)
    Versioned.writeCommitTime(dir, 2, 2000L)
    assert(Versioned.versionAsOf(dir, 1500L) == 1, "between commits → earlier")
    assert(Versioned.versionAsOf(dir, 2000L) == 2, "exact boundary → that commit")
    assert(Versioned.versionAsOf(dir, 99999L) == 2, "after last → latest")
    intercept[IllegalArgumentException] { Versioned.versionAsOf(dir, 999L) }
    // commit times are append-only in time
    Versioned.commitUpsert(spark, Seq((2L, "u2", 0)).toDF("k", "payload", "bucket"),
      dir, 3, "k", "bucket")
    intercept[IllegalArgumentException] { Versioned.writeCommitTime(dir, 3, 1500L) }
  }

  test("recluster rewrite: same rows under new buckets, one file each, old layout still travels") {
    val dir = tmp()
    val base = (0L until 96L).map(k => (k, s"p$k", (k % 4).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base.repartition(4), dir, "bucket", 4)
    val before = Versioned.readVersion(spark, dir, 1)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet

    // recluster: key-hash buckets → contiguous key-range stripes
    val reclustered = Versioned.readVersion(spark, dir, 1)
      .withColumn("bucket", expr("cast(k div 24 as int)"))
    Versioned.commitRewrite(reclustered, dir, 2, "bucket", 4)

    val after = Versioned.readVersion(spark, dir, 2)
      .select("k", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after == before, "reclustering must not change the rows")
    // the new clustering is real: bucket 0 holds exactly keys [0, 24)
    val b0 = Versioned.readVersion(spark, dir, 2)
      .where(col("bucket") === 0).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(b0 == (0L until 24L).toSet)
    // rewrite compacts as a side effect: one file per new bucket
    (0 until 4).foreach(b => assert(Versioned.parquetFileCount(dir, 2, b) == 1))
    // old layout intact for pinned readers
    assert(Versioned.readVersion(spark, dir, 1).count() == 96)
  }

  test("incremental bloom index equals a full rebuild byte for byte; untouched entries copied") {
    val dir = tmp()
    val base = (0L until 200L).map(k => (k, s"p$k", (k % 8).toInt))
      .toDF("k", "payload", "bucket")
    Versioned.commitBase(base, dir, "bucket", 8)
    Versioned.writeBloomIndex(spark, dir, 1, "k")
    val v1Lines = Files.readAllLines(
      java.nio.file.Paths.get(dir, "manifests", "v1.bloom.csv"))

    // delta confined to bucket 3: one updated payload + one new key
    val delta = Seq((3L, "upd", 3), (1003L, "new", 3)).toDF("k", "payload", "bucket")
    Versioned.commitUpsert(spark, delta, dir, 2, "k", "bucket")
    Versioned.writeBloomIndexIncremental(spark, dir, 2)
    val incPath = java.nio.file.Paths.get(dir, "manifests", "v2.bloom.csv")
    val incBytes = Files.readAllBytes(incPath).toSeq
    val incLines = Files.readAllLines(incPath)

    // untouched buckets' entries are the v1 lines verbatim
    def entry(lines: java.util.List[String], b: Int) =
      lines.toArray.map(_.toString).find(_.startsWith(s"$b,"))
    for (b <- 0 until 8 if b != 3)
      assert(entry(incLines, b) == entry(v1Lines, b),
        s"untouched bucket $b entry must be copied verbatim")
    assert(entry(incLines, 3) != entry(v1Lines, 3),
      "bucket 3 gained a key — its filter must have been rebuilt")

    // and the whole file equals a from-scratch rebuild over v2 state
    Versioned.writeBloomIndex(spark, dir, 2, "k")
    assert(Files.readAllBytes(incPath).toSeq == incBytes,
      "incremental index must be byte-identical to a full rebuild")

    // the new key is findable through the incremental index
    val (d, read) = Versioned.lookupKeys(spark, dir, 2, "k", Seq(1003L))
    assert(d.count() == 1 && read.contains(3))
  }

  test("delete-then-reinsert: upsert and merge into fully-emptied buckets degenerate to pure inserts") {
    val dir = tmp()
    val base = (0L until 12L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // v2 empties bucket 1 completely (every odd key deleted)
    val doomed = (0L until 12L).filter(_ % 2 == 1).map(k => (k, 1)).toDF("k", "bucket")
    Versioned.commitDelete(spark, doomed, dir, 2, "k", "bucket")
    assert(Versioned.readManifest(dir, 2)(1) == 0, "bucket 1 is the empty sentinel")
    // v3 re-inserts keys into ONLY the emptied bucket — the normal CDC
    // delete-then-reinsert sequence (used to crash readBuckets on an
    // all-sentinel assignment)
    val reins = Seq((1L, 100L, 1), (3L, 300L, 1)).toDF("k", "v", "bucket")
    Versioned.commitUpsert(spark, reins, dir, 3, "k", "bucket")
    val v3 = Versioned.readVersion(spark, dir, 3)
    assert(v3.count() == 8, "6 surviving even keys + 2 reinserted")
    assert(v3.where(col("k") === 1).head().getLong(1) == 100L)
    // empty the bucket again, then reinsert through commitMerge's U path
    Versioned.commitDelete(spark, Seq((1L, 1), (3L, 1)).toDF("k", "bucket"),
      dir, 4, "k", "bucket")
    assert(Versioned.readManifest(dir, 4)(1) == 0)
    val changes = Seq(("U", 5L, 500L, 1)).toDF("op", "k", "v", "bucket")
    Versioned.commitMerge(spark, changes, dir, 5, "k", "bucket")
    val v5 = Versioned.readVersion(spark, dir, 5)
    assert(v5.where(col("bucket") === 1).count() == 1)
    assert(v5.where(col("k") === 5).head().getLong(1) == 500L)
  }

  test("vacuum drops .time/.bloom sidecars; AS OF into the vacuumed range fails loudly") {
    val dir = tmp()
    val base = (0L until 8L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    Versioned.writeBloomIndex(spark, dir, 1, "k")
    Versioned.writeCommitTime(dir, 1, 1000L)
    Versioned.commitUpsert(spark, Seq((0L, 10L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    Versioned.writeCommitTime(dir, 2, 2000L)
    Versioned.commitUpsert(spark, Seq((1L, 11L, 1)).toDF("k", "v", "bucket"),
      dir, 3, "k", "bucket")
    Versioned.writeCommitTime(dir, 3, 3000L)
    Versioned.vacuum(dir, keep = 2) // v1 expires
    val m = java.nio.file.Paths.get(dir, "manifests")
    assert(!Files.exists(m.resolve("v1.csv")))
    assert(!Files.exists(m.resolve("v1.time")),
      "a surviving .time would make versionAsOf resolve to deleted data")
    assert(!Files.exists(m.resolve("v1.bloom.csv")))
    // AS OF in the vacuumed range: the clear retention error, never a
    // NoSuchFileException out of readVersion
    val e = intercept[IllegalArgumentException] { Versioned.versionAsOf(dir, 1500L) }
    assert(e.getMessage.contains("retained"))
    assert(Versioned.versionAsOf(dir, 2500L) == 2, "retained commits still resolve")
  }

  test("change feed preimages: U- carries the OLD payload, U+ the new; I/D unchanged; default feed untouched") {
    val dir = tmp()
    val base = Seq((1L, 10L, 0), (2L, 20L, 0), (3L, 30L, 1)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    val changes = Seq(("U", 2L, 200L, 0), ("D", 3L, 0L, 1), ("U", 9L, 90L, 1))
      .toDF("op", "k", "v", "bucket")
    Versioned.commitMerge(spark, changes, dir, 2, "k", "bucket")
    val (pre, _) = Versioned.changes(spark, dir, 1, 2, "k", withPreimage = true)
    val rows = pre.select("op", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("U-", 2L, 20L), ("U+", 2L, 200L), ("D", 3L, 30L),
      ("I", 9L, 90L)), s"got $rows")
    // the default three-op net feed is unchanged by the new parameter
    val (net, _) = Versioned.changes(spark, dir, 1, 2, "k")
    val netRows = net.select("op", "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(netRows == Set(("U", 2L, 200L), ("D", 3L, 30L), ("I", 9L, 90L)))
  }

  test("CDF-maintained rollup == recompute after mixed U/D/I — a group empties, a row moves groups") {
    val dir = tmp()
    // grain g, measure m: group c has ONE row (it must VANISH after the
    // delete); one a-row MOVES to group b (U- retracts from a, U+ adds to b)
    val base = Seq((1L, "a", 5L, 0), (2L, "a", 7L, 0), (3L, "b", 11L, 1), (4L, "c", 13L, 1))
      .toDF("k", "g", "m", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    val changes = Seq(("U", 2L, "b", 7L, 0), ("D", 4L, "", 0L, 1), ("U", 5L, "a", 17L, 1))
      .toDF("op", "k", "g", "m", "bucket")
    Versioned.commitMerge(spark, changes, dir, 2, "k", "bucket")
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
    val (cdf, _) = Versioned.changes(spark, dir, 1, 2, "k", withPreimage = true)
    val add = col("op").isin("I", "U+")
    val delta = cdf.groupBy(col("g"))
      .agg(sum(when(add, 1L).otherwise(-1L)).as("n"),
        sum(when(add, col("m")).otherwise(-col("m"))).as("sm"))
    val maintained = rollup(Versioned.readVersion(spark, dir, 1))
      .unionByName(delta)
      .groupBy(col("g")).agg(sum(col("n")).as("n"), sum(col("sm")).as("sm"))
      .where(col("n") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = rollup(Versioned.readVersion(spark, dir, 2))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained == recomputed, s"maintained $maintained != recompute $recomputed")
    assert(recomputed == Set(("a", 2L, 22L), ("b", 2L, 18L)),
      "group c gone; the moved row left a and joined b")
  }

  test("zone maps: all-NULL stats bucket omitted (no NPE); stats-less version serves unpruned") {
    val dir = tmp()
    val base = (0L until 12L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
      .withColumn("v", when(col("bucket") === 0, col("v"))) // bucket 1 all NULL
    Versioned.commitBase(base, dir, "bucket", 2)
    Versioned.writeStats(spark, dir, 1, "v") // used to NPE on the null min/max
    val stats = Versioned.readStats(dir, 1)
    assert(stats.contains(0) && !stats.contains(1),
      "an all-NULL bucket has no zone line (no non-null value matches any range)")
    val (df, read) = Versioned.readVersionWhere(spark, dir, 1, "v", 0L, 100L)
    assert(read == Set(0), "the NULL-only bucket is skipped")
    assert(df.count() == 6)
    // a version with NO stats file serves unpruned but correct (skipping is
    // an optimization the metadata earns, never a requirement)
    val dir2 = tmp()
    Versioned.commitBase(
      (0L until 12L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket"),
      dir2, "bucket", 2)
    val (df2, read2) = Versioned.readVersionWhere(spark, dir2, 1, "v", 2L, 5L)
    assert(read2 == Set(0, 1), "no stats file: every live bucket is read")
    assert(df2.select("k").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L, 4L, 5L))
  }

  test("optimistic concurrency: the second writer of one version fails loud, winner intact") {
    val dir = tmp()
    val base = (0L until 16L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // writer A commits v2
    Versioned.commitUpsert(spark, Seq((0L, 100L, 0)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    // writer B, having read latest=1 earlier, races to the same version:
    // the manifest CREATE_NEW is the commit point — B must fail LOUD, not
    // silently overwrite A's manifest (the lost update)
    val e = intercept[Exception] {
      Versioned.commitUpsert(spark, Seq((1L, 999L, 1)).toDF("k", "v", "bucket"),
        dir, 2, "k", "bucket")
    }
    assert(e.getMessage.contains("concurrent commit"))
    // A's commit is untouched: key 0 carries A's value, key 1 the base's
    val v2 = Versioned.readVersion(spark, dir, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2(0L) == 100L && v2(1L) == 1L)
    // re-staging a BOOTSTRAP over an ADVANCED store fails loud (r16,
    // ADVICE): v2's manifest still points at v1's data dir for untouched
    // buckets, so a bootstrap re-run would silently mutate v2's content —
    // the lost-update class the CREATE_NEW gate exists to close
    val eBase = intercept[Exception] {
      Versioned.commitBase(base, dir, "bucket", 2)
    }
    assert(eBase.getMessage.contains("advanced past the base"))
    // ...while re-staging over a BASE-ONLY store stays allowed (re-init,
    // not a lost update: no later manifest references the rewritten dir)
    val dir2 = tmp()
    Versioned.commitBase(base, dir2, "bucket", 2)
    Versioned.commitBase(base, dir2, "bucket", 2)
    assert(Versioned.readVersion(spark, dir2, 1).count() == 16L)
  }

  test("commitWithRetry: a disjoint interleaved writer retries and lands; overlap fails loud") {
    val dir = tmp()
    val base = (0L until 16L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    // writer A computed its delta against v1 (readV = 1)...
    val deltaA = Seq((0L, 100L, 0)).toDF("k", "v", "bucket")
    // ...but writer B lands v2 first, touching a DISJOINT key
    Versioned.commitUpsert(spark, Seq((3L, 300L, 1)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    // A's retry validates key-disjointness via the CDF of (v1, v2] and
    // re-commits at v3 — both writers' updates survive (no lost update,
    // no spurious conflict error)
    val vA = Versioned.commitUpsertWithRetry(spark, deltaA, dir, 1, "k", "bucket")
    assert(vA == 3)
    val st = Versioned.readVersion(spark, dir, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(st(0L) == 100L && st(3L) == 300L, "both writers' updates present")
    // writer C also read v1 but touches B's key: a GENUINE write-write
    // conflict — fail loud naming the key, never last-writer-wins
    val e = intercept[Exception] {
      Versioned.commitUpsertWithRetry(spark,
        Seq((3L, 999L, 1)).toDF("k", "v", "bucket"), dir, 1, "k", "bucket")
    }
    assert(e.getMessage.contains("write-write conflict"))
    assert(Versioned.latestVersion(dir) == 3, "the conflicted writer committed nothing")
    // retry exhaustion: a writer that keeps losing the in-flight race
    // rethrows after maxAttempts — bounded, never an infinite loop
    var calls = 0
    val e2 = intercept[Exception] {
      Versioned.commitWithRetry(spark, dir, deltaA.select(col("k")), 3, "k",
        maxAttempts = 2) { _ =>
        calls += 1; sys.error("graftstore concurrent commit: simulated race loss")
      }
    }
    assert(calls == 2 && e2.getMessage.contains("concurrent commit"))
  }

  test("commitAddColumns: schema-only commit, pinned reads unaffected, overlay survives vacuum") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = tmp()
    val base = (0L until 16L).map(k => (k, k, (k % 2).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 2)
    Versioned.commitAddColumns(spark, dir, 2,
      StructType(Seq(StructField("extra", LongType))))
    // zero data IO: v2 has no data directory of its own
    assert(!new java.io.File(s"$dir/data/v2").exists())
    val v2 = Versioned.readVersion(spark, dir, 2)
    assert(v2.columns.toSeq == Seq("k", "v", "bucket", "extra"))
    assert(v2.select("extra").collect().forall(_.isNullAt(0)), "null-filled")
    assert(!Versioned.readVersion(spark, dir, 1).columns.contains("extra"),
      "a pinned pre-ALTER read never sees the column")
    // duplicate and non-nullable adds are refused (add-only discipline)
    intercept[Exception] { Versioned.commitAddColumns(spark, dir, 3,
      StructType(Seq(StructField("EXTRA", LongType)))) }
    intercept[Exception] { Versioned.commitAddColumns(spark, dir, 3,
      StructType(Seq(StructField("e2", LongType, nullable = false)))) }
    // v3 materializes values for two keys; the rest stay null
    Versioned.commitUpsert(spark,
      Seq((0L, 50L, 0, 7L), (1L, 51L, 1, 8L)).toDF("k", "v", "bucket", "extra"),
      dir, 3, "k", "bucket")
    val v3 = Versioned.readVersion(spark, dir, 3)
      .select(col("k"), col("extra")) // partition col reads back last
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(v3(0L) == 7L && v3(1L) == 8L && v3(5L) == -1L)
    // the overlay SURVIVES vacuum: dropping v1/v2's manifests must not
    // lose the ALTER that later versions' effective schema depends on
    Versioned.vacuum(dir, 1)
    assert(Versioned.readVersion(spark, dir, 3).columns.contains("extra"))
  }

  test("changed-keys sidecars prefilter the feed without changing one row (r17)") {
    val dir = tmp()
    val base = (0L until 40L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, dir, "bucket", 4)
    // v2 upsert: update 2 keys + insert 1
    Versioned.commitUpsert(spark,
      Seq((0L, 1000L, 0), (5L, 1005L, 1), (101L, 101L, 1)).toDF("k", "v", "bucket"),
      dir, 2, "k", "bucket")
    // v3 delete: 2 keys
    Versioned.commitDelete(spark, Seq((2L, 2), (7L, 3)).toDF("k", "bucket"),
      dir, 3, "k", "bucket")
    // v4 merge: one update, one delete, one insert
    Versioned.commitMerge(spark,
      Seq(("U", 1L, 9001L, 1), ("D", 4L, 0L, 0), ("U", 202L, 202L, 2))
        .toDF("op", "k", "v", "bucket"),
      dir, 4, "k", "bucket")
    // every data commit recorded a bloom (+range: long keys, small delta)
    def side(v: Int, kind: String) =
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "manifests", s"v$v.ckeys.$kind"))
    (2 to 4).foreach { v =>
      assert(side(v, "bloom") && side(v, "range"), s"v$v sidecar missing")
    }
    // the feed over every window equals the UNFILTERED feed (sidecars
    // renamed away -> the fallback full-read path), net and preimage modes
    def dump(fromV: Int, toV: Int, pre: Boolean) =
      Versioned.changes(spark, dir, fromV, toV, "k", withPreimage = pre)._1
        .collect().map(_.toString).sorted.toSeq
    val manifests = new java.io.File(s"$dir/manifests")
    def stash(): Unit = manifests.listFiles()
      .filter(f => f.getName.contains(".ckeys.") && !f.getName.endsWith(".off"))
      .foreach(f => f.renameTo(new java.io.File(manifests, f.getName + ".off")))
    def unstash(): Unit = manifests.listFiles()
      .filter(_.getName.endsWith(".off"))
      .foreach(f => f.renameTo(
        new java.io.File(manifests, f.getName.stripSuffix(".off"))))
    val windows = Seq((1, 2), (2, 3), (3, 4), (1, 4), (2, 4))
    val filtered = windows.map { case (a, b) =>
      (dump(a, b, pre = false), dump(a, b, pre = true)) }
    stash()
    val unfiltered = windows.map { case (a, b) =>
      (dump(a, b, pre = false), dump(a, b, pre = true)) }
    unstash()
    assert(filtered == unfiltered,
      "changed-keys prefilter altered the feed")
    // marker kinds: compact -> none (no logical change, window spanning it
    // still filters); rewrite -> all (windows spanning it read unfiltered)
    Versioned.commitCompact(spark, dir, 5, "bucket")
    assert(side(5, "none"))
    val (afterCompact, _) = Versioned.changes(spark, dir, 4, 5, "k")
    assert(afterCompact.count() == 0, "compact must not feed changes")
    Versioned.commitRewrite(Versioned.readVersion(spark, dir, 5), dir, 6,
      "bucket", 4)
    assert(side(6, "all"))
    val (afterRewrite, _) = Versioned.changes(spark, dir, 5, 6, "k")
    assert(afterRewrite.count() == 0, "content-identical rewrite feeds nothing")
  }
}
