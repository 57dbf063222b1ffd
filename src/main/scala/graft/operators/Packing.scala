package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining-pipeline step that concatenates
  * documents into fixed-token-budget training sequences. The classic greedy
  * packer is inherently sequential (each doc's pack depends on every prior
  * doc), which cannot scale; the distributed form used at corpus scale is
  * SHARDED LINEAR PACKING:
  *
  *  1. shard each doc by a salted content hash — packing becomes
  *     embarrassingly parallel across shards, and the assignment is a pure
  *     function of doc identity (reproducible across runs/engines/backfills);
  *  2. within a shard, order docs deterministically and take a running token
  *     total (one window aggregate);
  *  3. a doc starts in pack `cum_before div budget` — packs can overflow by
  *     at most one document, which the downstream tokenizer splits/truncates
  *     anyway (the standard approximation; bin-perfect packing is NP-hard
  *     and, worse, sequential).
  *
  * Everything is integer arithmetic → bit-identical across engines with no
  * rounding discipline needed.
  *
  * Scale notes (100 TB stance): one shuffle (the window's hash partition by
  * shard). `shards` should be ≥ the cluster's task parallelism at real scale
  * so no window partition exceeds an executor (1024+ on a 1000-executor
  * cluster; 8 here keeps the testdata from fragmenting into trivial packs).
  * The window itself is a running sum — Spark evaluates it streaming per
  * partition, no buffering of the full frame.
  */
object Packing {

  /** (doc_id, shard, pack_id, offset, n_tokens) for every document.
    * `offset` is the doc's starting token position inside its pack. */
  def packSequences(docs: DataFrame, docId: String, nTokens: Column,
                    budget: Int, shards: Int): DataFrame = {
    val salted = concat(lit("pack:"), col(docId).cast("string"))
    val t = docs.select(col(docId), nTokens.cast("long").as("n_tokens"),
      (graft.functions.VectorSql.md5Hash60(salted) % shards).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col(docId))
    t.withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col(docId), col("shard"),
        expr(s"(cum - n_tokens) div $budget").as("pack_id"),
        ((col("cum") - col("n_tokens")) % budget).as("offset"),
        col("n_tokens"))
  }

  /** One packed-doc assignment row of [[packSequencesNoSplit]]. `waste_frac`
    * is the fraction of the doc's PACK left unused (same value on every row
    * of a pack) — exact-integer numerator over a double divide, so both
    * engines compute the identical IEEE result. */
  final case class PackedDoc(doc_id: Long, shard: Long, pack_id: Long,
                             offset: Long, n_tokens: Long, waste_frac: Double)

  /** NO-SPLIT (atomic-document) packing — next-fit within a shard: a doc
    * that would overflow the running pack closes it and opens the next one,
    * so no document ever straddles a pack boundary; the cost is tracked
    * padding waste (`waste_frac`) instead of tokenizer-side splits. A doc
    * longer than the whole budget gets a pack of its own (overflowing —
    * rejecting it is a quality-filter decision, not the packer's).
    *
    * Next-fit is a SEQUENTIAL fold (each decision depends on the previous
    * pack's fill), which no window aggregate expresses — so this is the one
    * packer that genuinely needs imperative per-partition logic:
    * `repartition(shard)` + `sortWithinPartitions` + a streaming
    * `mapPartitions` whose state is one pack's rows (O(docs-per-pack)
    * memory, never the partition). Same single shuffle as the splitting
    * packer; determinism comes from the same salted-hash shard assignment
    * plus the in-shard doc-id order.
    *
    * (First-fit/best-fit would pack tighter but need all open packs as
    * state and lose streaming; next-fit is the standard scale compromise.) */
  def packSequencesNoSplit(docs: DataFrame, docId: String, nTokens: Column,
                           budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0)
    val session = docs.sparkSession
    import session.implicits._
    val salted = concat(lit("pack:"), col(docId).cast("string"))
    val t = docs.select(col(docId).cast("long").as("doc_id"),
        nTokens.cast("long").as("n_tokens"),
        (graft.functions.VectorSql.md5Hash60(salted) % shards).as("shard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
    t.mapPartitions { rows =>
      new Iterator[PackedDoc] {
        private val pending = scala.collection.mutable.Queue.empty[PackedDoc]
        private val packBuf =
          scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
        private var curShard = Long.MinValue
        private var packId = 0L
        private var used = 0L

        // pack closes → its waste is known; flush the buffered rows
        private def closePack(): Unit = {
          val waste = math.max(budget - used, 0L).toDouble / budget
          packBuf.foreach { case (doc, shard, pack, off, n) =>
            pending.enqueue(PackedDoc(doc, shard, pack, off, n, waste))
          }
          packBuf.clear()
        }

        private def advance(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val (doc, n, shard) = rows.next()
            if (shard != curShard) {
              if (packBuf.nonEmpty) closePack()
              curShard = shard; packId = 0L; used = 0L
            } else if (used + n > budget && used > 0) {
              closePack()
              packId += 1; used = 0L
            }
            packBuf += ((doc, shard, packId, used, n))
            used += n
          }
          if (pending.isEmpty && !rows.hasNext && packBuf.nonEmpty) closePack()
        }

        override def hasNext: Boolean = {
          if (pending.isEmpty) advance()
          pending.nonEmpty
        }
        override def next(): PackedDoc = {
          if (!hasNext) throw new NoSuchElementException
          pending.dequeue()
        }
      }
    }.toDF()
  }
}
