package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** WINDOWED streaming KMV — [[KmvStream]]'s idempotent min-set fold keyed
  * by EVENT-TIME WINDOW with watermark eviction, the cardinality twin of
  * [[WinCmsStream]]: per-period distinct counting whose state is k longs
  * per LIVE window only — bounded in the key dimension by the sketch (k
  * smallest distinct hashes, never the member set) and in the time
  * dimension by the watermark (a window's sketch drops the first batch
  * after the watermark passes its end; a row that could still change it
  * would be watermark-late by the same clock). The fold stays
  * commutative + idempotent + monotone, so within a window the final
  * sketch equals the batch sketch whatever the batch boundaries, and
  * the catalog entry's read-back applies the batch Bar-Yossef
  * arithmetic under a per-window DuckDB oracle. */
object WinKmvStream {

  /** One arriving hash: event-time window id, the 60-bit portable hash,
    * and the row's event timestamp (the watermark column). */
  final case class WinHash(win: Long, h: Long, ts: java.sql.Timestamp)
  final case class WinKmvState(mins: Array[Long], seen: Long)
  /** Per-batch snapshot of window `win`'s sketch summary. */
  final case class WinKmvOut(win: Long, seen: Long, nh: Int, hk: Long)

  /** `winMs`: window width in ms — window `win` covers
    * `[win·winMs, (win+1)·winMs)` on the event clock. */
  def sketchStream(rows: Dataset[WinHash], k: Int, winMs: Long): Dataset[WinKmvOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.win)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (win: Long, it: Iterator[WinHash], state: GroupState[WinKmvState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(WinKmvState(Array.empty, 0L))
            var n = prev.seen
            val set = scala.collection.mutable.SortedSet.empty[Long] ++ prev.mins
            it.foreach { r =>
              n += 1
              set += r.h
              if (set.size > k) set -= set.last
            }
            val mins = set.toArray // ascending
            state.update(WinKmvState(mins, n))
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(wm + 1, (win + 1) * winMs))
            Iterator.single(WinKmvOut(win, n, mins.length, mins.last))
          }
      }
  }
}
