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
}
