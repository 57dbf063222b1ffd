package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING BLOOM filter — membership-set maintenance as stream state,
  * completing the streaming sketch family's three fold classes:
  *
  *   - [[KmvStream]]  — idempotent MIN-set fold   (cardinality)
  *   - [[CmsStream]]  — additive counter fold     (frequency)
  *   - this           — idempotent UNION fold     (membership)
  *
  * Member keys arrive as a stream; the filter's bit array is the state,
  * SHARDED by position (`shard = pos mod P`, each group owning the
  * `⌈m/P⌉`-bit slice it packs as longs) so the build parallelizes across
  * P state groups instead of funnelling every position through one task
  * — the partitioned form a 2 GB-at-1e9-keys filter needs. Bit-OR is
  * commutative, associative, AND idempotent, so the final filter is
  * invariant to row order, batch boundaries, and at-least-once replays
  * (the KMV replay-safety class — BloomStreamSpec asserts a duplicate
  * re-feed is a no-op, in deliberate contrast to CMS where the same spec
  * shape asserts doubling); the streamed filter therefore equals the
  * batch-built filter bit for bit and the catalog entry
  * (`bloom_membership_stream`) shares `q_bloom_membership`'s DuckDB
  * oracle VERBATIM. State per group is the bit slice + one counter —
  * filter-sized by design (the filter IS the artifact), never key-count
  * × position-width. Emissions are state snapshots; max-`seen` read-back
  * collapses replays (the family's sink convention). */
object BloomStream {

  /** One arriving set-bit: owning shard, bit index WITHIN the shard. */
  final case class PosShard(shard: Int, local: Long)
  final case class BloomState(words: Array[Long], seen: Long)
  /** Per-batch snapshot of shard `shard`'s packed bit slice. */
  final case class BloomOut(shard: Int, seen: Long, words: Array[Long])

  def filterStream(rows: Dataset[PosShard], shardBits: Long): Dataset[BloomOut] = {
    import rows.sparkSession.implicits._
    val nWords = ((shardBits + 63) / 64).toInt
    rows.groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[PosShard], state: GroupState[BloomState]) =>
          val prev = state.getOption.getOrElse(BloomState(new Array[Long](nWords), 0L))
          val words = prev.words.clone()
          var n = prev.seen
          it.foreach { p =>
            n += 1
            words((p.local / 64).toInt) |= 1L << (p.local % 64)
          }
          state.update(BloomState(words, n))
          Iterator.single(BloomOut(shard, n, words))
      }
  }
}
