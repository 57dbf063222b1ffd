package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING COUNT-MIN frequency sketch — continuous heavy-hitter
  * monitoring (the streaming twin of the batch `q_topk_freq_cms`, the
  * FREQUENCY member of the sketch family next to the streaming KMV
  * cardinality fold [[KmvStream]]): keyed rows arrive as a stream and
  * each sketch ROW of the d×w counter matrix folds its arriving bucket
  * increments into per-group state.
  *
  * CMS is the easiest sketch to stream because counters ADD:
  *
  *  - live state is exactly w longs + one counter PER SKETCH ROW (d
  *    groups total — d·w integers forever, the same bound the batch
  *    sketch carries, independent of key cardinality AND stream length);
  *  - addition is commutative/associative, so the final matrix is
  *    independent of row order and batch boundaries (sum-of-batch-sums
  *    == sum) — CmsStreamSpec replays the corpus under different file
  *    splits and asserts the identical matrix, and the catalog entry
  *    `cms_freq_stream` shares the batch entry's DuckDB oracle VERBATIM
  *    (estimates and the ranked heavy-hitter report included);
  *  - unlike KMV's idempotent hash-set fold, a re-fed ROW double-counts
  *    — at-least-once upstream delivery is NOT safe; the entry gets
  *    exactly-once from the checkpointed file source, and the emitted
  *    (group, seen, counters) rows are state SNAPSHOTS, so a replayed
  *    emission is an idempotent duplicate the max-`seen` read-back
  *    collapses (the KmvStream sink convention).
  *
  * At 100 TB this is pipeline observability: token/key frequency
  * tracking at d·w-integer state, one stateful operator, no rescan; the
  * heavy-hitter report stays a broadcast join + distributed top-k on the
  * batch side of the read-back. */
object CmsStream {

  /** One arriving bucket increment: sketch row r, column c. */
  final case class Bucket(r: Int, c: Long)
  final case class CmsState(counts: Array[Long], seen: Long)
  /** Per-batch state snapshot for sketch row `r` (monotone `seen` picks
    * the final snapshot at read-back). */
  final case class CmsRowOut(r: Int, seen: Long, counts: Array[Long])

  def sketchStream(rows: Dataset[Bucket], w: Int): Dataset[CmsRowOut] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.r)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (r: Int, it: Iterator[Bucket], state: GroupState[CmsState]) =>
          val prev = state.getOption.getOrElse(CmsState(new Array[Long](w), 0L))
          val counts = prev.counts.clone()
          var n = prev.seen
          it.foreach { b => n += 1; counts(b.c.toInt) += 1 }
          state.update(CmsState(counts, n))
          Iterator.single(CmsRowOut(r, n, counts))
      }
  }
}
