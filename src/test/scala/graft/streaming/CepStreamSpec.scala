package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CEP (events_pattern_stream): the per-user state machine must
  * reproduce the batch window rewrite's match semantics — next-purchase
  * decides all pending views, errors veto strictly-between only (an error
  * AT the purchase timestamp does not), the match window binds — across
  * batch splits, and pending state must retire to ZERO rows once the
  * watermark passes every view's horizon. */
class CepStreamSpec extends SparkSpec {

  private val WinUs = 30L * 60 * 1000000L
  private val Base = 86400000L // ms
  private def min(m: Long): Long = m * 60000L

  /** (event_id, msOffset, user, type) batches → (matches as (user, view_us), final state rows). */
  private def run(batches: Seq[Seq[(Long, Long, Long, String)]]): (Set[(Long, Long)], Long) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val name = s"cep_${System.nanoTime()}"
    val src = mem.toDF().toDF("event_id", "ms", "user_id", "event_type")
      .withColumn("ts", timestamp_millis(col("ms") + lit(Base)))
      .withColumn("value", lit(0.0))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    val q = EventStream.patternStream(src, WinUs).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val st = try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      q.recentProgress.flatMap(_.stateOperators).lastOption
        .map(_.numRowsTotal).getOrElse(0L)
    } finally q.stop()
    (spark.table(name).collect()
      .map(r => (r.getLong(0), (r.getLong(1) - Base * 1000L) / 60000000L)).toSet, st)
  }

  test("match, error veto, window bound, and the at-purchase tie") {
    val (got, _) = run(Seq(Seq(
      // user 1: view → purchase 10 min later: match
      (1L, min(0), 1L, "view"), (2L, min(10), 1L, "purchase"),
      // user 2: error strictly between: veto
      (3L, min(0), 2L, "view"), (4L, min(5), 2L, "error"), (5L, min(10), 2L, "purchase"),
      // user 3: purchase outside the 30-min window: no match
      (6L, min(0), 3L, "view"), (7L, min(40), 3L, "purchase"),
      // user 4: error AT the purchase timestamp (lower id): tie does not veto
      (8L, min(0), 4L, "view"), (9L, min(10), 4L, "error"), (10L, min(10), 4L, "purchase"),
      // user 5: two views, one purchase decides both (second within window)
      (11L, min(0), 5L, "view"), (12L, min(8), 5L, "view"), (13L, min(20), 5L, "purchase"))))
    assert(got == Set((1L, 0L), (4L, 0L), (5L, 0L), (5L, 8L)),
      s"got $got")
  }

  test("pending views cross batch boundaries; the split is invisible") {
    val whole = Seq(
      (1L, min(0), 1L, "view"), (2L, min(10), 1L, "purchase"),
      (3L, min(2), 2L, "view"), (4L, min(6), 2L, "error"), (5L, min(12), 2L, "purchase"))
    val (oneShot, _) = run(Seq(whole))
    val (split, _) = run(Seq(whole.take(3), whole.drop(3)))
    assert(oneShot == split, s"batch split moved the match set: $oneShot vs $split")
    assert(oneShot == Set((1L, 0L)))
  }

  test("a never-purchasing user's state retires to zero rows at the horizon") {
    val (got, finalState) = run(Seq(
      Seq((1L, min(0), 1L, "view")),
      // another user's traffic 2h later: watermark (10-min delay) passes
      // user 1's 30-min horizon, the timeout fires, state drops
      Seq((2L, min(120), 2L, "click")),
      Seq((3L, min(130), 2L, "click"))))
    assert(got.isEmpty)
    assert(finalState == 0L,
      s"pending views must evict at the horizon, still $finalState state rows")
  }
}
