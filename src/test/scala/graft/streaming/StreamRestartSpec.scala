package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Checkpoint-RESTART proof (VERDICT r5 task 7): the five catalog sinks run
  * AvailableNow start-to-finish; this spec kills runs after their first file
  * batch, restarts a NEW query from the same checkpoint, and compares the
  * final sink against an uninterrupted run.
  *
  * The kill point is a batch boundary: sink commit and offset commit are
  * atomic per batch (the parquet sink's manifest), so a mid-batch kill
  * cannot commit and simply replays the batch from the checkpointed offsets
  * — batch-boundary restart is exactly the recovery surface.
  *
  * Two operators, two contracts:
  *  - `hourly` (pure watermark agg): restart-TRANSPARENT — the sink must be
  *    byte-identical to the uninterrupted run.
  *  - `resampleStream` (flatMapGroupsWithState): data rows are exactly-once
  *    and identical, but a restart is DORMANCY for users with no in-flight
  *    data — their grids close (the documented timeout semantics) and the
  *    zero-filled gap rows spanning the restart are elided, exactly as the
  *    scaladoc specifies ("a later resume starts a fresh grid"). The spec
  *    pins that the difference is ONLY such zero-fill rows — nothing
  *    duplicated, no data row lost.
  */
class StreamRestartSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  private def clearDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }

  private def runStream(fork: SparkSession, inDir: String, outDir: String,
                        ckpt: String, schema: StructType)
                       (transform: DataFrame => DataFrame): Unit = {
    val stream = fork.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per batch → real batch boundaries
      .parquet(inDir)
    val q = transform(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Split sf0.001 events at the median timestamp; part 2 carries a
    * far-future sentinel so every window/grid drains at the end. */
  private def fixture(fork: SparkSession): (DataFrame, DataFrame, StructType) = {
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // pin UTC explicitly (not via the builder default) so the NTZ->Timestamp
    // cast inside EventTs cannot skew if the harness conf changes (r7 advisory)
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = fork.read.parquet(s"$dir/events.parquet")
    val src = raw
      .select(col("event_id"), graft.queries.EventTs.tsTimestamp(raw).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val midUs = src.agg(percentile_approx(unix_micros(col("ts")), lit(0.5), lit(100)))
      .head.getLong(0)
    val maxUs = src.agg(max(unix_micros(col("ts")))).head.getLong(0)
    val sentinel = fork.range(1).select(
      lit(-1L).as("event_id"),
      timestamp_micros(lit(maxUs + 86400L * 1000000)).as("ts"),
      lit(-1L).as("user_id"), lit("view").as("event_type"), lit(0.0).as("value"))
    (src.where(unix_micros(col("ts")) <= midUs),
      src.where(unix_micros(col("ts")) > midUs).union(sentinel),
      src.schema)
  }

  /** Run transform twice: once killed+restarted at the file boundary, once
    * uninterrupted; return both sinks. */
  private def killRestartVsStraight(name: String)
                                   (transform: SparkSession => DataFrame => DataFrame)
      : (DataFrame, DataFrame, SparkSession) = {
    val fork = spark.newSession()
    fork.conf.set("spark.sql.shuffle.partitions", "4")
    val (part1, part2, schema) = fixture(fork)
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_restart_${name}_${ProcessHandle.current().pid()}")
    clearDir(root)
    val (restarted, straight) = (s"$root/restarted", s"$root/straight")

    // interrupted: batch 1 → query STOPS (the kill) → more files → RESTART
    part1.coalesce(1).write.parquet(s"$restarted/in")
    runStream(fork, s"$restarted/in", s"$restarted/out", s"$restarted/ckpt", schema)(transform(fork))
    part2.coalesce(1).write.mode("append").parquet(s"$restarted/in")
    runStream(fork, s"$restarted/in", s"$restarted/out", s"$restarted/ckpt", schema)(transform(fork))

    // uninterrupted twin: both files present from the start, one run
    part1.coalesce(1).write.parquet(s"$straight/in")
    part2.coalesce(1).write.mode("append").parquet(s"$straight/in")
    runStream(fork, s"$straight/in", s"$straight/out", s"$straight/ckpt", schema)(transform(fork))

    (fork.read.parquet(s"$restarted/out"), fork.read.parquet(s"$straight/out"), fork)
  }

  test("hourly agg restarted from checkpoint is byte-identical to an uninterrupted run") {
    val (a, b, _) = killRestartVsStraight("hourly") { _ => df =>
      EventStream.hourly(df).select(
        unix_micros(col("hour")).as("hour_us"), col("event_type"),
        col("n"), round(col("sum_value"), 4).as("sum_value"))
    }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).sorted.toSeq
    val (ra, rb) = (rows(a), rows(b))
    assert(ra.nonEmpty)
    assert(ra == rb, "windowed agg must be restart-transparent (exactly-once)")
  }

  test("resample restart: data rows exactly-once, only dormancy zero-fill elided") {
    val (a, b, _) = killRestartVsStraight("resample") { fork => df =>
      import fork.implicits._
      EventStream.resampleStream(
          df.as[EventStream.Event], intervalUs = 15L * 60 * 1000000)
        .filter(_.user_id >= 0).toDF()
    }
    def rows(df: DataFrame) = df
      .select(col("user_id"), col("bucket"), col("n"), col("state"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val (ra, rb) = (rows(a), rows(b))
    assert(ra.nonEmpty)
    // exactly-once: no (user, bucket) emitted twice despite the restart
    assert(ra.map(t => (t._1, t._2)).distinct.size == ra.size,
      "a replayed batch must not double-emit any bucket row")
    // every DATA row (n > 0) identical to the uninterrupted run
    assert(ra.filter(_._3 > 0).sorted == rb.filter(_._3 > 0).sorted,
      "no data row may be lost or altered across the restart")
    // the only divergence: zero-fill gap rows spanning the restart dormancy
    // (grids of users with no in-flight data close on the run-1 tail batch)
    val onlyStraight = rb.toSet -- ra.toSet
    assert((ra.toSet -- rb.toSet).isEmpty,
      "restarted run must not invent rows the uninterrupted run lacks")
    assert(onlyStraight.forall(_._3 == 0),
      s"only zero-fill rows may be elided, got: ${onlyStraight.filter(_._3 > 0).take(5)}")
  }

  test("CEP pattern restarted from checkpoint is match-identical to an uninterrupted run") {
    // pending views live in checkpointed state and the decision points
    // (purchase arrival, event-time horizon) are all event-time, so a
    // batch-boundary restart must be fully TRANSPARENT — unlike resample
    // there is no dormancy divergence to allow for: a view pending at the
    // kill either matches its next purchase after the restart or ages out
    // identically in both runs.
    val (a, b, _) = killRestartVsStraight("cep") { fork => df =>
      import fork.implicits._
      EventStream.patternStream(
          df.as[EventStream.Event], windowUs = 30L * 60 * 1000000)
        .filter(_.user_id >= 0).toDF()
    }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val (ra, rb) = (rows(a), rows(b))
    assert(ra.nonEmpty, "the fixture must produce at least one match")
    assert(ra == rb, "the CEP match set must be restart-transparent")
  }

  test("attribution restarted from checkpoint is contribution-identical to an uninterrupted run") {
    // the horizon-live touch list crosses the kill inside checkpointed
    // state and purchases attribute the moment they arrive, so there is
    // no dormancy to allow for: a touch remembered at the kill must credit
    // post-restart purchases exactly as if the run never stopped, and no
    // contribution row may be duplicated or lost
    val (a, b, _) = killRestartVsStraight("attrib") { fork => df =>
      import fork.implicits._
      EventStream.attributionStream(
        df.select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
            expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
          .as[EventStream.AttEvent],
        lookbackUs = 7L * 86400L * 1000000L).toDF()
    }
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    val (ra, rb) = (rows(a), rows(b))
    assert(ra.nonEmpty, "the fixture must attribute at least one purchase")
    assert(ra == rb, "the contribution multiset must be restart-transparent")
  }
}
