package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** WINDOWED streaming count-min sketch — [[CmsStream]]'s additive fold
  * keyed by EVENT-TIME WINDOW, with watermark-driven state eviction:
  * continuous per-period heavy-hitter monitoring whose state is bounded
  * in BOTH dimensions — d·w longs per window (the CMS bound, independent
  * of key cardinality) × only the windows the watermark hasn't retired
  * (the horizon-eviction bound, independent of stream length). The
  * unbounded-window `CmsStream` keeps one matrix forever; this keeps a
  * matrix per LIVE window and drops each one once the watermark proves
  * no more rows can reach it.
  *
  * Mechanics: group key = (window, sketch row); each batch folds bucket
  * increments and emits a state snapshot (max-`seen` read-back collapses
  * replayed emissions — the family's sink convention); the timeout
  * timestamp sits at the window's end (clamped above the current
  * watermark as the engine requires), so the first batch whose watermark
  * passes the window end removes the group. A row later than the
  * watermark is dropped by the engine BEFORE the operator — the same
  * contract that lets state go: watermark-late data and evicted windows
  * are one decision, not two (WinCmsStreamSpec feeds a late row after
  * eviction and asserts both that the final matrix excludes it and that
  * state rows genuinely dropped mid-stream). */
object WinCmsStream {

  /** One arriving increment: event-time window id, sketch row `r`,
    * column `c`, and the row's event timestamp (the watermark column). */
  final case class WinBucket(win: Long, r: Int, c: Long, ts: java.sql.Timestamp)
  final case class WinCmsState(counts: Array[Long], seen: Long)
  /** Per-batch snapshot of window `win`'s sketch row `r`. */
  final case class WinCmsOut(win: Long, r: Int, seen: Long, counts: Array[Long])

  /** `winMs`: the window width in ms — window `win` covers
    * `[win·winMs, (win+1)·winMs)` on the event clock. */
  def sketchStream(rows: Dataset[WinBucket], w: Int, winMs: Long): Dataset[WinCmsOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(b => (b.win, b.r))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, Int), it: Iterator[WinBucket], state: GroupState[WinCmsState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(WinCmsState(new Array[Long](w), 0L))
            val counts = prev.counts.clone()
            var n = prev.seen
            it.foreach { b => n += 1; counts(b.c.toInt) += 1 }
            state.update(WinCmsState(counts, n))
            // evict as soon as the watermark passes the window end — a
            // later row for this window would be watermark-late anyway
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(wm + 1, (key._1 + 1) * winMs))
            Iterator.single(WinCmsOut(key._1, key._2, n, counts))
          }
      }
  }
}
