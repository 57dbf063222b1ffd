package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event queries
  * (`graft.queries.EventQueries`): the same transformations expressed over an
  * unbounded source. Batch is the oracle-checkable form; these run the
  * identical logic with watermarks + state so the engine's streaming claim is
  * real, not aspirational.
  *
  * Source contract: a streaming DataFrame with (event_id long, ts timestamp,
  * user_id long, event_type string, value double) — e.g.
  * `spark.readStream.format("rate")` remapped in tests, or a Kafka/file
  * source in production.
  *
  * Scale notes: both queries shuffle once per trigger on the grouping key;
  * state size is bounded by the watermark (hourly windows age out after the
  * delay; sessions time out via [[GroupStateTimeout.EventTimeTimeout]]).
  */
object EventStream {

  /** Tumbling 1-hour windowed counts/sums per event type with a 10-minute
    * watermark — streaming twin of `EventQueries.hourly`. */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming exactly-once event dedup: drop replayed event_ids within the
    * watermark horizon (state bounded by the watermark — the streaming twin
    * of exact dedup for at-least-once sources). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  /** start/last are epoch MICROseconds — `Timestamp.getTime` (ms) truncates
    * sub-ms parts and drifts the duration off the batch twin's integer-us
    * arithmetic by up to a second on boundaries. */
  case class SessionState(start: Long, last: Long, n: Int, sum: Double)
  case class Session(user_id: Long, n_events: Int, duration_s: Long, sum_value: Double)

  /** Exact epoch-us of a Timestamp: getTime gives floor-ms, getNanos the full
    * fractional second. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  case class ResampleState(curBucket: Long, curN: Long,
                           curLastUs: Long, curLastState: String)
  case class BucketRow(user_id: Long, bucket: Long, n: Long, state: String)

  /** Streaming twin of `EventQueries.resample` (dense per-user bucket grid,
    * zero-filled gaps, forward-filled state) with FINALIZE-ON-ADVANCE
    * semantics: a bucket is emitted only when a LATER bucket's event
    * arrives — so a trigger boundary in mid-bucket never splits a bucket's
    * count across output rows (append mode cannot revise), and the gap
    * buckets between two events are emitted exactly once, carrying the
    * finalized bucket's state forward. State per user is O(1): the open
    * bucket's running (count, last-event) plus nothing else. On timeout
    * (event-time watermark passing the open bucket) the open bucket
    * flushes, mirroring the batch twin's grid ending at the user's last
    * event. In-bucket ties resolve exactly like the batch twin: last event
    * by (ts, then state) wins the carried state.
    *
    * After a timeout flush the user's grid is CLOSED: if the user later
    * resumes, a fresh grid starts at the new event's bucket (no zero-filled
    * rows spanning the dormant period). The batch twin, computing one grid
    * over the whole dataset, WOULD fill that dormancy — the streaming form
    * treats a flush like the batch twin treats the corpus boundary. Align
    * the flush delay with the longest dormancy that should stay one grid. */
  def resampleStream(events: Dataset[Event], intervalUs: Long,
                     flushDelay: String = "10 minutes"): Dataset[BucketRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", flushDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ResampleState, BucketRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ResampleState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(BucketRow(userId, s.curBucket, s.curN, s.curLastState))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_type))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[BucketRow]
            sorted.foreach { e =>
              val t = micros(e.ts)
              val b = t / intervalUs
              cur match {
                case Some(s) if b == s.curBucket =>
                  // same lexicographic (ts, state) max as the batch twin's
                  // max(struct(ts_us, state))
                  val wins = t > s.curLastUs ||
                    (t == s.curLastUs && e.event_type >= s.curLastState)
                  val (lu, ls) =
                    if (wins) (t, e.event_type) else (s.curLastUs, s.curLastState)
                  cur = Some(ResampleState(b, s.curN + 1, lu, ls))
                case Some(s) if b > s.curBucket =>
                  out += BucketRow(userId, s.curBucket, s.curN, s.curLastState)
                  // zero-filled gap buckets carry the finalized state
                  var g = s.curBucket + 1
                  while (g < b) { out += BucketRow(userId, g, 0L, s.curLastState); g += 1 }
                  cur = Some(ResampleState(b, 1L, t, e.event_type))
                case Some(s) => // below the open (already-advanced) bucket:
                  // its bucket row is finalized and emitted — standard
                  // streaming late-data semantics, drop it (the watermark
                  // bounds how late that can happen)
                  cur = Some(s)
                case None =>
                  cur = Some(ResampleState(b, 1L, t, e.event_type))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush the open bucket once event time passes its end + delay
              state.setTimeoutTimestamp(((s.curBucket + 1) * intervalUs + 999) / 1000,
                flushDelay)
            }
            out.iterator
          }
      }
  }

  /** 30-minute-gap sessionization with explicit state — streaming twin of
    * `EventQueries.sessionize`, emitting a row when a session times out.
    * Gap/duration arithmetic is integer epoch-us, identical to the batch
    * (and DuckDB-oracle) form. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.n, (s.last - s.start) / 1000000, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value))
                case Some(s) =>
                  out += Session(userId, s.n, (s.last - s.start) / 1000000, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout clock is ms-granular: CEIL the µs horizon so the
              // timeout never lands before s.last+gapUs — flooring could
              // close a session up to 999µs early and split what the batch
              // twin merges
              state.setTimeoutTimestamp((s.last + gapUs + 999) / 1000)
            }
            out.iterator
          }
      }
  }
}
