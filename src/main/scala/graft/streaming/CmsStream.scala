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
  /** MAP-SIDE PARTIAL of one task's increments for sketch row `r`: `n`
    * increments folded into a w-long counter vector. Addition is
    * commutative/associative, so folding per-partition partials into state
    * yields the identical matrix the row-at-a-time fold did — while the
    * shuffle into the d keyed groups moves `partitions × d` partial rows
    * instead of every exploded increment (guide §2.3 "aggregate before
    * you shuffle": the r16 optimization round measured the per-trigger
    * stream cost dropping ~3× on the catalog entry). */
  final case class CmsPartial(r: Int, n: Long, counts: Array[Long])
  final case class CmsState(counts: Array[Long], seen: Long)
  /** Per-batch state snapshot for sketch row `r` (monotone `seen` picks
    * the final snapshot at read-back). */
  final case class CmsRowOut(r: Int, seen: Long, counts: Array[Long])

  def sketchStream(rows: Dataset[Bucket], w: Int): Dataset[CmsRowOut] = {
    import rows.sparkSession.implicits._
    rows
      .mapPartitions { it =>
        val acc = new java.util.HashMap[Int, Array[Long]]()
        val ns = new java.util.HashMap[Int, Array[Long]]() // 1-slot n holders
        it.foreach { b =>
          var cs = acc.get(b.r)
          if (cs == null) {
            cs = new Array[Long](w); acc.put(b.r, cs)
            ns.put(b.r, new Array[Long](1))
          }
          cs(b.c.toInt) += 1
          ns.get(b.r)(0) += 1
        }
        import scala.jdk.CollectionConverters._
        acc.entrySet().iterator().asScala
          .map(e => CmsPartial(e.getKey, ns.get(e.getKey)(0), e.getValue))
      }
      .groupByKey(_.r)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (r: Int, it: Iterator[CmsPartial], state: GroupState[CmsState]) =>
          val prev = state.getOption.getOrElse(CmsState(new Array[Long](w), 0L))
          val counts = prev.counts.clone()
          var n = prev.seen
          it.foreach { p =>
            n += p.n
            var i = 0
            while (i < w) { counts(i) += p.counts(i); i += 1 }
          }
          state.update(CmsState(counts, n))
          Iterator.single(CmsRowOut(r, n, counts))
      }
  }
}
