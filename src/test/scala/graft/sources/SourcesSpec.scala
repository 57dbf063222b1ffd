package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_sources").toString

  test("csv round-trip with explicit schema, malformed rows tolerated") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "id,name,score\n1,alpha,0.5\n2,beta,0.75\nnot_a_number,gamma,oops\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Sources.readCsv(spark, s"$dir/in.csv", schema)
    assert(df.count() == 3)
    assert(df.where(col("id").isNull).count() == 1) // quarantined, not fatal
    assert(df.where(col("id") === 1).head().getString(1) == "alpha")
  }

  test("json-lines round-trip with explicit schema") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id": 1, "tags": ["a", "b"]}
        |{"id": 2, "tags": []}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("tags", ArrayType(StringType))))
    val df = Sources.readJson(spark, s"$dir/in.json", schema)
    assert(df.count() == 2)
    assert(df.where(col("id") === 1).head().getSeq[String](1) == Seq("a", "b"))
  }

  test("orc round-trip is lossless and pushes predicates into the scan") {
    val dir = tmp()
    import spark.implicits._
    val src = Seq((1L, "a", 0.5), (2L, "b", 1.5), (3L, "c", 2.5)).toDF("id", "name", "x")
    Sources.writeOrc(src, s"$dir/t.orc")
    val back = Sources.readOrc(spark, s"$dir/t.orc")
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
    val p = back.where(col("id") > 1).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"ORC scan must receive the pushed predicate:\n$p")
  }

  test("partitioned sink produces prunable directories and prunes them on read") {
    val dir = tmp() + "/out"
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i % 4)).toDF("id", "bucket")
    Sources.writePartitioned(df, dir, "bucket")
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    val back = spark.read.parquet(dir).where(col("bucket") === 2)
    assert(back.count() == 25)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(bucket"),
      "partition filter must prune directories, not scan+filter")
  }

  test("schema evolution: mergeSchema unions old and new parquet layouts") {
    // a years-old 100 TB dataset accretes columns; old files must keep
    // reading (new column null) without a rewrite, and the merged read must
    // still prune to only the requested columns
    val dir = tmp() + "/evolving"
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 0.5)).toDF("id", "name", "score").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "batch"))
    val rows = merged.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(0.5)))
    val plan = merged.select("id", "score").queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<id:bigint,score:double>"),
      s"merged read must still prune columns:\n$plan")
  }

  test("IVF layout: cell partition column prunes ANN probe reads") {
    val dir = tmp() + "/ivf"
    import spark.implicits._
    val assigned = (0 until 60)
      .map(i => (i.toLong, Array.fill(4)(i.toDouble), i % 3L)).toDF("vec_id", "v", "cell")
    Sources.writeIvfLayout(assigned, dir)
    val probe = spark.read.parquet(dir).where(col("cell").isin(0L, 2L))
    assert(probe.count() == 40)
    // not just the PartitionFilters *label* (present even when empty): the
    // scan must have actually selected 2 of the 3 cell directories
    val scans = probe.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    assert(scans.head.partitionFilters.nonEmpty, "cell predicate must reach partition pruning")
    assert(scans.head.selectedPartitions.partitionCount == 2,
      s"expected 2 pruned cell dirs, scanned ${scans.head.selectedPartitions.partitionCount}")
  }

  test("z-order layout: box read prunes to overlapping buckets, rows lossless") {
    import spark.implicits._
    val dir = tmp()
    // 32×32 grid of (a, b) points, one row each
    val df = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong, s"$a:$b"))
      .toDF("a", "b", "payload")
    Sources.writeZorderLayout(df, "a", "b", dir, bitsPerDim = 3)
    def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      assert(scans.head.partitionFilters.nonEmpty,
        "zbucket predicate must reach partition pruning")
      scans.head.selectedPartitions.partitionCount
    }
    // a small box: a in [0,3], b in [0,3] → exactly one 4×4 grid cell
    val read = Sources.zorderRead(spark, dir, 0, 3, 0, 3)
    assert(spark.read.parquet(s"$dir/data").inputFiles.length >= 64,
      "expected 64 bucket files")
    assert(scannedPartitions(read) == 1,
      "one-cell box must read exactly 1 bucket dir")
    // a wider box spans 2×2 cells → 4 buckets; exact predicate restores rows
    val wide = Sources.zorderRead(spark, dir, 2, 5, 2, 5)
      .where(col("a").between(2, 5) && col("b").between(2, 5))
    assert(scannedPartitions(wide) == 4)
    assert(wide.count() == 16)
    val expect = df.where(col("a").between(2, 5) && col("b").between(2, 5))
      .select("payload").collect().map(_.getString(0)).toSet
    assert(wide.select("payload").collect().map(_.getString(0)).toSet == expect)
  }

  test("hilbert layout: box read prunes to overlapping buckets via run ranges, rows lossless") {
    import spark.implicits._
    val dir = tmp()
    val df = (for (a <- 0 until 32; b <- 0 until 32) yield (a.toLong, b.toLong, s"$a:$b"))
      .toDF("a", "b", "payload")
    Sources.writeHilbertLayout(df, "a", "b", dir, bitsPerDim = 3)
    def scannedPartitions(df: org.apache.spark.sql.DataFrame): Int = {
      val scans = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec")
      assert(scans.head.partitionFilters.nonEmpty,
        "hbucket range predicate must reach partition pruning")
      scans.head.selectedPartitions.partitionCount
    }
    // one 4×4 grid cell → exactly 1 bucket dir, exactly 1 run
    val read = Sources.hilbertRead(spark, dir, 0, 3, 0, 3)
    assert(spark.read.parquet(s"$dir/data").inputFiles.length >= 64)
    assert(scannedPartitions(read) == 1)
    // a 2×2-cell box: 4 buckets, and by the curve's adjacency they form
    // FEWER disjoint id ranges than Morton's scattered ids would
    val wide = Sources.hilbertRead(spark, dir, 2, 5, 2, 5)
      .where(col("a").between(2, 5) && col("b").between(2, 5))
    assert(scannedPartitions(wide) == 4)
    assert(wide.count() == 16)
    val expect = df.where(col("a").between(2, 5) && col("b").between(2, 5))
      .select("payload").collect().map(_.getString(0)).toSet
    assert(wide.select("payload").collect().map(_.getString(0)).toSet == expect)
  }

  test("compaction rewrites a fragmented directory into target-sized files, losslessly") {
    val dir = tmp() + "/frag"
    import spark.implicits._
    val df = (0 until 20000).map(i => (i.toLong, s"row_$i")).toDF("id", "s")
    df.repartition(64).write.parquet(dir) // 64 tiny files — the streaming-sink disease
    def parquetFiles() = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 32, "fixture must actually be fragmented")
    val totalBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Sources.compact(spark, dir, targetBytes = totalBytes / 4)
    assert(n <= 5, s"expected ~4 files, got $n")
    assert(parquetFiles() == n, "on-disk layout must match the reported count")
    val back = spark.read.parquet(dir)
    assert(back.count() == 20000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      == (0L until 20000L).sum)
    // idempotent: compacting an already-compacted dir keeps the count
    assert(Sources.compact(spark, dir, targetBytes = totalBytes / 4) <= n + 1)
  }

  test("deletePartitioned rewrites only affected partitions; others stay byte-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmp() + "/layout"
    // keys 0..29 across three partitions; doomed ids 3, 7 live ONLY in p=a
    val df = (0L until 30L).map(i => (i, if (i < 10) "a" else if (i < 20) "b" else "c"))
      .toDF("id", "p")
    Sources.writePartitioned(df, dir, "p")
    def files(part: String): Map[String, (Long, Long)] =
      new java.io.File(s"$dir/p=$part").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length, f.lastModified)).toMap
    val (b0, c0) = (files("b"), files("c"))
    Sources.deletePartitioned(spark, dir, "p", "id", Seq(3L, 7L).toDF("id"))
    assert(files("b") == b0 && files("c") == c0,
      "partitions without doomed keys must not be rewritten")
    val back = spark.read.parquet(dir)
    assert(back.count() == 28)
    assert(back.where(col("id").isin(3L, 7L)).count() == 0, "doomed ids must be gone")
    assert(back.where(col("p") === "a").count() == 8, "survivors in the rewritten partition")
    // deleting nothing touches nothing
    val a1 = files("a")
    Sources.deletePartitioned(spark, dir, "p", "id", Seq(999L).toDF("id"))
    assert(files("a") == a1 && files("b") == b0 && files("c") == c0)
    // a FULLY-doomed partition must disappear: dynamic overwrite alone
    // would leave its files behind (no survivor rows mention it) — the
    // review-confirmed forget-nothing failure mode
    Sources.deletePartitioned(spark, dir, "p", "id", (10L until 20L).toDF("id"))
    assert(!new java.io.File(s"$dir/p=b").exists, "emptied partition dir must be removed")
    val after = spark.read.parquet(dir)
    assert(after.where(col("p") === "b").count() == 0)
    assert(after.count() == 18 && files("c") == c0)
  }
}
