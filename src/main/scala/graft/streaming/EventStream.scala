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

  /** Sliding 1-hour windows every 15 minutes per event type — the
    * OVERLAPPING-window streaming shape (each event lands in 4 windows;
    * state is 4 window rows per (window, type), aged out by the
    * watermark). Streaming twin of `EventQueries.sliding`. */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** STREAM-STATIC join + windowed agg: enrich the unbounded stream with a
    * broadcast dimension (user → tier), then hourly counts per tier. The
    * static side is planned once and broadcast to every micro-batch — no
    * state beyond the windowed agg's, no re-shuffle of the stream for the
    * join (the canonical dimension-enrichment shape; at 100 TB/day the
    * stream side never repartitions for dimension lookups). */
  def hourlyByTier(events: DataFrame, userTiers: DataFrame): DataFrame =
    // watermark BEFORE the join: rows the dimension filters out (e.g. a
    // flush sentinel from an unknown user) must still advance event time,
    // or the final windows never finalize in append mode
    events.withWatermark("ts", "10 minutes")
      .join(broadcast(userTiers), "user_id")
      .groupBy(window(col("ts"), "1 hour"), col("tier"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("tier"), col("n"), col("sum_value"))

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
    * arithmetic by up to a second on boundaries. `seq` is the per-user
    * session ordinal (1-based, event-time order) so the emitted rows carry
    * the same `session_id` the batch gaps-and-islands form assigns. */
  case class SessionState(start: Long, last: Long, n: Int, sum: Double, seq: Long)
  case class Session(user_id: Long, session_id: Long, n_events: Int,
                     duration_s: Long, sum_value: Double)

  /** Exact epoch-us of a Timestamp: getTime gives floor-ms, getNanos the full
    * fractional second. */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  case class OpenBucket(bucket: Long, n: Long, lastUs: Long, lastState: String)
  case class ResampleState(lastFinalized: Long, carried: String,
                           open: List[OpenBucket]) // sorted by bucket, ≤ lateBuckets+1 entries
  case class BucketRow(user_id: Long, bucket: Long, n: Long, state: String)

  /** Streaming twin of `EventQueries.resample` (dense per-user bucket grid,
    * zero-filled gaps, forward-filled state). A REORDER WINDOW of the
    * newest `lateBuckets + 1` buckets stays open per user; a bucket is
    * emitted (with the zero-filled gaps before it, carrying state forward)
    * only once it falls behind that window — so a trigger boundary never
    * splits a bucket's count across append-mode rows, and an out-of-order
    * event up to `lateBuckets` buckets behind the newest still lands in its
    * correct bucket (size `lateBuckets` ≈ allowed lateness / interval; the
    * old zero-window behavior silently dropped any event that arrived after
    * a later bucket's, even when the watermark had admitted it). Events
    * below the finalized frontier are genuinely late and are dropped.
    * State per user is O(lateBuckets). In-bucket ties resolve exactly like
    * the batch twin: lexicographic max of (ts, state).
    *
    * On timeout (event-time watermark passing the newest open bucket's end
    * + delay) all open buckets drain and the user's grid is CLOSED: a later
    * resume starts a fresh grid at the new event's bucket (no zero-filled
    * rows spanning the dormancy — the batch twin, computing one grid over
    * the whole dataset, WOULD fill it; a flush is this form's corpus
    * boundary). A single gap wider than `maxGapBuckets` also closes the
    * grid instead of emitting the zero rows — one clock-skewed outlier
    * timestamp must not expand into billions of filler rows. */
  def resampleStream(events: Dataset[Event], intervalUs: Long,
                     flushDelay: String = "10 minutes",
                     lateBuckets: Int = 1,
                     maxGapBuckets: Long = 100000L): Dataset[BucketRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", flushDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ResampleState, BucketRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[ResampleState]) =>

          // finalize every bucket ≤ cut: returns emitted rows as lazy
          // per-segment iterators (gap ranges never materialize) and the
          // advanced (frontier, carried, remaining-open)
          def drain(s: ResampleState, cut: Long): (Iterator[BucketRow], ResampleState) = {
            val (done, keep) = s.open.partition(_.bucket <= cut)
            var frontier = s.lastFinalized
            var carried = s.carried
            val segs = scala.collection.mutable.ArrayBuffer.empty[Iterator[BucketRow]]
            done.foreach { ob =>
              val gapStart = if (frontier == Long.MinValue) ob.bucket else frontier + 1
              if (ob.bucket - gapStart < maxGapBuckets) {
                val st = carried
                segs += Iterator.range(gapStart, ob.bucket)
                  .map(g => BucketRow(userId, g, 0L, st))
              } // else: chasm — grid closes across it, no filler rows
              segs += Iterator.single(BucketRow(userId, ob.bucket, ob.n, ob.lastState))
              frontier = ob.bucket
              carried = ob.lastState
            }
            (segs.iterator.flatten, ResampleState(frontier, carried, keep))
          }

          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            drain(s, Long.MaxValue)._1
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_type))
            var s = state.getOption.getOrElse(ResampleState(Long.MinValue, null, Nil))
            sorted.foreach { e =>
              val t = micros(e.ts)
              val b = Math.floorDiv(t, intervalUs) // floor like batch/oracle, not Java trunc
              if (b > s.lastFinalized) { // else: below the frontier — late, drop
                val updated = s.open.find(_.bucket == b) match {
                  case Some(ob) =>
                    val wins = t > ob.lastUs ||
                      (t == ob.lastUs && e.event_type >= ob.lastState)
                    val nb =
                      if (wins) OpenBucket(b, ob.n + 1, t, e.event_type)
                      else ob.copy(n = ob.n + 1)
                    s.open.map(x => if (x.bucket == b) nb else x)
                  case None =>
                    (OpenBucket(b, 1L, t, e.event_type) :: s.open).sortBy(_.bucket)
                }
                s = s.copy(open = updated)
              }
            }
            if (s.open.isEmpty) { state.getOption.foreach(_ => state.update(s)); Iterator.empty }
            else {
              val maxB = s.open.map(_.bucket).max
              val (rows, next) = drain(s, maxB - lateBuckets - 1)
              state.update(next)
              // flush once event time passes the newest open bucket's end
              state.setTimeoutTimestamp(((maxB + 1) * intervalUs + 999) / 1000,
                flushDelay)
              rows
            }
          }
      }
  }

  /** 30-minute-gap sessionization with explicit state — streaming twin of
    * `EventQueries.sessionize`, emitting a row when a session times out.
    * Gap/duration arithmetic is integer epoch-us, identical to the batch
    * (and DuckDB-oracle) form.
    *
    * Session ORDINALS survive timeout flushes: the flush leaves a TOMBSTONE
    * (`n = 0`, no timeout registered) carrying the last emitted `seq`, so a
    * user who goes dormant and returns in a later micro-batch gets
    * `seq + 1` — the same numbering the batch gaps-and-islands form assigns
    * — instead of restarting at 1. State cost: one tombstone row per
    * ever-seen user (the same |users| bound the batch computation holds;
    * a production deployment would age tombstones out and accept
    * renumbering beyond that horizon). */
  /** Per-user funnel state: earliest view time seen, purchases already
    * counted (ts strictly after that view), and the PENDING purchases not
    * yet resolvable (ts ≤ current earliest view — an even earlier view may
    * still arrive and flip them to counted). Counting is monotone: once a
    * purchase beats the running-min view time it beats every smaller one,
    * so `counted` never needs revisiting; only the (typically tiny)
    * pre-view purchase list is buffered. lastUs drives the idle timeout. */
  case class FunnelState(minViewUs: Long, counted: Long,
                         pending: List[Long], lastUs: Long)
  case class FunnelRow(user_id: Long, n_purchases_after_view: Long)

  /** Streaming twin of `EventQueries.funnel` (first view → later purchases):
    * the per-user result emits when the user's stream goes idle past the
    * flush delay (event-time timeout, like [[sessionize]]); state is
    * O(pre-view purchases), watermark-bounded. Users with zero qualifying
    * purchases emit nothing — exactly the batch join's semantics. */
  def funnelStream(events: Dataset[Event],
                   flushDelay: String = "10 minutes"): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", flushDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            if (s.minViewUs != Long.MaxValue && s.counted > 0)
              Iterator.single(FunnelRow(userId, s.counted))
            else Iterator.empty
          } else {
            var s = state.getOption.getOrElse(
              FunnelState(Long.MaxValue, 0L, Nil, 0L))
            batch.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts)
              if (t > s.lastUs) s = s.copy(lastUs = t)
              e.event_type match {
                case "view" if t < s.minViewUs =>
                  // min view moved earlier: pending purchases past it resolve
                  val (now, still) = s.pending.partition(_ > t)
                  s = FunnelState(t, s.counted + now.size, still, s.lastUs)
                case "purchase" =>
                  if (t > s.minViewUs) s = s.copy(counted = s.counted + 1)
                  else s = s.copy(pending = t :: s.pending)
                case _ => ()
              }
            }
            state.update(s)
            state.setTimeoutTimestamp((s.lastUs + 999) / 1000, flushDelay)
            Iterator.empty
          }
      }
  }

  /** One pending view: its event-time plus the first error event-time
    * ORDER-after it (None until one arrives) — exactly the two values the
    * batch twin's conditional window mins carry to the view's row. */
  case class PendingView(viewUs: Long, firstErrorUs: Option[Long])
  case class PatternState(pending: List[PendingView]) // ascending viewUs
  case class PatternMatch(user_id: Long, view_us: Long)

  /** Streaming CEP — incremental twin of `EventQueries.pattern` (view
    * matched by the user's NEXT purchase within `windowUs`, no error
    * strictly between). The state machine exploits the pattern's
    * decide-at-next-purchase structure: per user, pending views accumulate
    * with the first error seen after each; when a purchase arrives it IS
    * every pending view's next purchase, so all of them match (within
    * window, unvetoed) or die NOW and the list clears — state never
    * outlives one purchase-to-purchase gap. Pending views are also pruned
    * as soon as any later event puts them beyond the match window (a
    * future purchase would be later still), and an event-time timeout at
    * the newest pending view's horizon retires users who never purchase —
    * live state is horizon-bounded, not corpus-bounded. Within a batch,
    * events sort by (ts_us, event_id) — the batch twin's frame order — so
    * tie semantics (same-ts purchase with higher id matches; error AT the
    * purchase's timestamp doesn't veto) reproduce exactly; across
    * batches the caller must feed event-time-ordered slices (the
    * staged-file discipline of the windowed-sketch entries). */
  def patternStream(events: Dataset[Event], windowUs: Long): Dataset[PatternMatch] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, PatternMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[PatternState]) =>
          if (state.hasTimedOut) {
            // watermark passed every pending view's horizon: none can match
            state.remove()
            Iterator.empty
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var pending = state.getOption.map(_.pending).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
            sorted.foreach { e =>
              val t = micros(e.ts)
              // any future purchase is ≥ t: views beyond the window are dead
              pending = pending.filter(v => t - v.viewUs <= windowUs)
              e.event_type match {
                case "view" =>
                  pending = pending :+ PendingView(t, None)
                case "purchase" =>
                  // this IS every pending view's next purchase: decide all
                  pending.foreach { v =>
                    if (v.firstErrorUs.forall(_ >= t)) out += PatternMatch(userId, v.viewUs)
                  }
                  pending = Nil
                case "error" =>
                  pending = pending.map(v =>
                    if (v.firstErrorUs.isEmpty) v.copy(firstErrorUs = Some(t)) else v)
                case _ => () // other event types don't participate
              }
            }
            // views whose horizon the watermark already passed can never
            // match (any admitted purchase is above the watermark)
            val wmUs = state.getCurrentWatermarkMs() * 1000
            pending = pending.filter(_.viewUs + windowUs >= wmUs)
            if (pending.isEmpty) state.remove()
            else {
              state.update(PatternState(pending))
              // newest view's horizon, CEILed to ms like sessionize; the
              // wm-prune leaves horizon ≥ wm, but equality is rejected —
              // clamp one ms past the watermark
              val horizonMs = (pending.map(_.viewUs).max + windowUs + 999) / 1000
              state.setTimeoutTimestamp(
                math.max(horizonMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

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
            state.update(s.copy(n = 0)) // tombstone: ordinal kept, no timeout
            Iterator.single(Session(userId, s.seq, s.n, (s.last - s.start) / 1000000, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            // a tombstone (n = 0) means "no open session; last ordinal = seq"
            var cur = state.getOption.filter(_.n > 0)
            var lastSeq = state.getOption.map(_.seq).getOrElse(0L)
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.sum + e.value, s.seq))
                case Some(s) =>
                  out += Session(userId, s.seq, s.n, (s.last - s.start) / 1000000, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value, s.seq + 1))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value, lastSeq + 1))
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

  /** Input row for [[attributionStream]]: money already exact cents. */
  case class AttEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, cents: Long)
  /** One remembered touch inside the lookback horizon. */
  case class Touch(us: Long, id: Long, channel: String)
  /** Per-user state: horizon-bounded touch list + the user's event clock. */
  case class AttState(touches: List[Touch], lastUs: Long)
  /** One attribution contribution (the batch twin's explode rows). */
  case class AttRow(channel: String, f: Long, l: Long, lin: Long)

  /** MULTI-TOUCH ATTRIBUTION, incremental — the streaming twin of the
    * batch RANGE-frame entry: per-user state is ONLY the touches inside
    * the lookback horizon (view/click within 7 days — per-user rate ×
    * horizon, never history-sized), and every purchase attributes
    * IMMEDIATELY against that state (first/last/linear in the exact
    * integer-cents arithmetic of the batch twin, remainder to the last
    * touch), so the operator emits as it goes — no pending obligations,
    * no flush sentinel needed. Horizon pruning runs on every arrival at
    * `min(user clock, watermark) − lookback`: under time-ordered slice
    * staging the user clock alone is safe (later batches carry strictly
    * later timestamps), and the watermark bound keeps the prune correct
    * for any within-watermark disorder a production source could emit.
    * Users go quiet → event-time timeout drops the whole state. The
    * drained sink re-aggregated per channel must equal the batch entry
    * bit for bit — the oracle is shared verbatim. */
  def attributionStream(events: Dataset[AttEvent], lookbackUs: Long,
                        flushDelay: String = "1 day"): Dataset[AttRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", flushDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttState, AttRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, batch: Iterator[AttEvent], state: GroupState[AttState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var s = state.getOption.getOrElse(AttState(Nil, 0L))
            val out = scala.collection.mutable.ArrayBuffer.empty[AttRow]
            batch.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
              val t = micros(e.ts)
              if (t > s.lastUs) s = s.copy(lastUs = t)
              e.event_type match {
                case "view" | "click" =>
                  s = s.copy(touches = Touch(t, e.event_id, e.event_type) :: s.touches)
                case "purchase" =>
                  val win = s.touches
                    .filter(x => x.us < t && x.us >= t - lookbackUs)
                    .sortBy(x => (x.us, x.id))
                  if (win.isEmpty)
                    out += AttRow("direct", e.cents, e.cents, e.cents)
                  else {
                    val n = win.size
                    val per = e.cents / n
                    val rem = e.cents - per * n
                    out += AttRow(win.head.channel, e.cents, 0L, 0L)
                    out += AttRow(win.last.channel, 0L, e.cents, 0L)
                    val nView = win.count(_.channel == "view")
                    val nClick = n - nView
                    if (nView > 0) out += AttRow("view", 0L, 0L, per * nView +
                      (if (win.last.channel == "view") rem else 0L))
                    if (nClick > 0) out += AttRow("click", 0L, 0L, per * nClick +
                      (if (win.last.channel == "click") rem else 0L))
                  }
                case _ => ()
              }
            }
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val bound = math.min(s.lastUs, if (wmUs > 0) wmUs else s.lastUs)
            s = s.copy(touches = s.touches.filter(_.us >= bound - lookbackUs))
            state.update(s)
            // evict the whole user one lookback past their last event
            state.setTimeoutTimestamp((s.lastUs + lookbackUs + 999) / 1000)
            out.iterator
          }
      }
  }
}
