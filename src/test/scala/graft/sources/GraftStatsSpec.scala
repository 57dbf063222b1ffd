package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import java.nio.file.Files

/** `SupportsReportStatistics` on the connector's scan (r15): the scan
  * reports its REAL footprint — assigned buckets' on-disk bytes scaled by
  * the pruned/full column-width ratio, rows from the commit-log sidecar —
  * so Catalyst can plan broadcasts from facts instead of
  * `defaultSizeInBytes`. Pins: byte/row fidelity, column-pruning and
  * bloom-pruning shrinkage, and the payoff — a hint-free
  * BroadcastHashJoin against a small graftstore dimension. */
class GraftStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stats").toString
    val base = (0L until 512L).map(k => (k, s"payload_$k", (k % 8).toInt))
      .toDF("k", "txt", "bucket")
    Versioned.commitBase(base, d, "bucket", 8)
    Versioned.writeRowCounts(spark, d, 1)
    Versioned.writeBloomIndex(spark, d, 1, "k")
    d
  }

  private def tableSchema =
    spark.read.format("graftstore").option("path", dir).load().schema

  private def stats(build: GraftStoreScanBuilder => Unit = _ => ()) = {
    val sb = new GraftStoreScanBuilder(tableSchema, dir, 1)
    build(sb)
    sb.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
  }

  test("reported size is the filesystem's, rows are the sidecar's") {
    val st = stats()
    val fsBytes = Versioned.sizeOfBuckets(dir, Versioned.readManifest(dir, 1))
    assert(fsBytes > 0L)
    assert(st.sizeInBytes.getAsLong == fsBytes)
    assert(st.numRows.getAsLong == 512L)
  }

  test("column pruning scales the size estimate down") {
    val full = stats()
    val narrow = stats { sb =>
      sb.pruneColumns(org.apache.spark.sql.types.StructType(
        tableSchema.fields.filter(_.name == "k")))
    }
    assert(narrow.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong)
    // rows are unaffected by projection
    assert(narrow.numRows.getAsLong == 512L)
  }

  test("a bloom-pruned key filter shrinks bytes and rows together") {
    val full = stats()
    val pruned = stats(_.pushFilters(Array(EqualTo("k", 3L))))
    assert(pruned.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong)
    assert(pruned.numRows.getAsLong < 512L)
    // the surviving buckets still hold the probed key's rows
    assert(pruned.numRows.getAsLong >= 64L)
  }

  test("_commit_version metadata column is hidden but selectable") {
    val df = spark.read.format("graftstore").option("path", dir).load()
    assert(!df.columns.contains("_commit_version")) // hidden from SELECT *
    val byVer = df.select(col("k"), col("_commit_version"))
      .groupBy(col("_commit_version")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byVer == Map(1 -> 512L))
  }

  test("_commit_version reflects each bucket's writing commit after an upsert") {
    val d = Files.createTempDirectory("graft_meta").toString
    val base = (0L until 64L).map(k => (k, k, (k % 4).toInt)).toDF("k", "v", "bucket")
    Versioned.commitBase(base, d, "bucket", 4)
    // touch ONLY bucket 0 (keys ≡ 0 mod 4)
    Versioned.commitUpsert(spark,
      Seq((0L, 100L, 0), (4L, 104L, 0)).toDF("k", "v", "bucket"), d, 2, "k", "bucket")
    val byVer = spark.read.format("graftstore").option("path", d).load()
      .select(col("k"), col("_commit_version"))
      .groupBy(col("_commit_version")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byVer == Map(1 -> 48L, 2 -> 16L)) // bucket 0's 16 rows re-stamped
  }

  test("a small graftstore dimension auto-broadcasts with no hint") {
    // AQE off so the BroadcastHashJoin is attributable ONLY to the
    // reported statistics (AQE could convert at runtime regardless)
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (10L * 1024 * 1024).toString) {
      val dim = spark.read.format("graftstore").option("path", dir).load()
      val fact = spark.range(0L, 5000L).select((col("id") % 512).as("k"))
      val joined = fact.join(dim, Seq("k")).agg(count(lit(1)).as("n"))
      assert(joined.head().getLong(0) == 5000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    }
  }
}
