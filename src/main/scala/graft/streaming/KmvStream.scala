package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING KMV distinct-count sketch — continuous cardinality
  * monitoring (the streaming twin of the batch
  * `q_approx_distinct_kmv`): keyed rows arrive as a stream and each
  * micro-batch emits the group's updated sketch summary. KMV is the
  * sketch that is actually BUILT for this deployment: its state is just
  * the k smallest DISTINCT values of a deterministic hash — a
  * commutative, idempotent, monotone fold — so
  *
  *  - live state is k longs + one counter PER GROUP, bounded forever
  *    (unlike the corpus-sized carried-member state the streaming dedup
  *    family needs horizon eviction for);
  *  - the final state is independent of row order AND batch boundaries
  *    (union-then-take-k == take-k-of-unions), so the streamed sketch
  *    equals the batch sketch verbatim — KmvStreamSpec replays the
  *    corpus under different file splits and asserts identical output,
  *    and the catalog entry shares the batch entry's DuckDB oracle;
  *  - duplicate arrivals (same key seen twice, or a replayed batch
  *    re-feeding rows) cannot move the estimate — hash-set idempotence,
  *    the property that makes the sketch safe under at-least-once
  *    upstream delivery.
  *
  * Each batch a group receives rows, it emits (group, seen, nh, hk):
  * `seen` is the monotone total-rows counter (the read-back picks each
  * group's max-`seen` row as the final state), `nh`/`hk` are the sketch
  * summary the Bar-Yossef estimate is computed from at read-back with
  * the SAME arithmetic as the batch entry. At 100 TB this is pipeline
  * observability: per-key distinct tracking at k-longs-per-key state,
  * one stateful operator, no rescan. */
object KmvStream {

  final case class KeyedHash(flag: String, h: Long)
  /** MAP-SIDE PARTIAL of one task's rows for `flag`: `n` rows folded into
    * that partition's k smallest DISTINCT hashes. take-k-of-unions ==
    * union-then-take-k (the monotone idempotent fold the scaladoc sells),
    * so merging partials into state is value-identical to the
    * row-at-a-time fold while the keyed shuffle moves `partitions × flags`
    * partial rows instead of every input row (guide §2.3). */
  final case class KmvPartial(flag: String, n: Long, mins: Array[Long])
  final case class KmvState(mins: Array[Long], seen: Long)
  final case class KmvOut(l_returnflag: String, seen: Long, nh: Int, hk: Long)

  def sketchStream(rows: Dataset[KeyedHash], k: Int): Dataset[KmvOut] = {
    import rows.sparkSession.implicits._
    rows
      .mapPartitions { it =>
        val acc = new java.util.HashMap[String, scala.collection.mutable.SortedSet[Long]]()
        val ns = new java.util.HashMap[String, Array[Long]]()
        it.foreach { r =>
          var set = acc.get(r.flag)
          if (set == null) {
            set = scala.collection.mutable.SortedSet.empty[Long]
            acc.put(r.flag, set); ns.put(r.flag, new Array[Long](1))
          }
          ns.get(r.flag)(0) += 1
          set += r.h
          if (set.size > k) set -= set.last
        }
        import scala.jdk.CollectionConverters._
        acc.entrySet().iterator().asScala
          .map(e => KmvPartial(e.getKey, ns.get(e.getKey)(0), e.getValue.toArray))
      }
      .groupByKey(_.flag)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (flag: String, it: Iterator[KmvPartial], state: GroupState[KmvState]) =>
          val prev = state.getOption.getOrElse(KmvState(Array.empty, 0L))
          var n = prev.seen
          // k smallest DISTINCT hashes: dedupe against carried + within batch
          val set = scala.collection.mutable.SortedSet.empty[Long] ++ prev.mins
          it.foreach { p =>
            n += p.n
            p.mins.foreach { h =>
              set += h
              if (set.size > k) set -= set.last
            }
          }
          val mins = set.toArray // ascending
          state.update(KmvState(mins, n))
          Iterator.single(KmvOut(flag, n, mins.length, mins.last))
      }
  }
}
