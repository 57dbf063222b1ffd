package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted sequential sharding — the export step that turns a cleaned
  * corpus into fixed-budget training shards (the WebDataset/streaming-loader
  * shape: a trainer maps shard id → file, so shard assignment must be
  * deterministic and order-stable).
  */
object Shards {

  /** Greedy sequential fill in global `id` order: doc i goes to shard
    * `floor(cumBefore(i) / budget)` — a new shard starts exactly when the
    * running token total crosses a budget multiple (a shard may overflow by
    * its last doc; docs are never split — the no-split packer's contract).
    *
    * The global running total is computed as a DISTRIBUTED prefix sum:
    * ids range-bucket by `bucket = id div bucketSize`, per-bucket totals
    * roll up to exact bucket offsets (one ordered window over ~N/bucketSize
    * rows — metadata-scale when bucketSize ~ √N, never the corpus), and the
    * corpus-scale cumsum is a window PARTITIONED BY BUCKET (parallel) plus
    * the broadcast offset. The naive spelling — `Window.orderBy(id)` with
    * no partition — funnels the whole corpus through ONE task and is the
    * textbook 100 TB scale-killer this decomposition exists to avoid.
    * Result is bucketSize-invariant (ShardsSpec proves it), so the oracle
    * replays the plain global cumsum.
    *
    * @return (doc, t, shard) */
  def assignShards(docs: DataFrame, id: String, tokens: String,
                   budget: Long, bucketSize: Long): DataFrame = {
    require(budget > 0 && bucketSize > 0)
    val b = docs.select(col(id).cast("long").as("doc"),
        col(tokens).cast("long").as("t"))
      .withColumn("bkt", expr(s"doc div $bucketSize"))
    val offW = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy(col("bkt")).agg(sum(col("t")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(offW), lit(0L)))
      .select(col("bkt"), col("off"))
    val inW = Window.partitionBy(col("bkt")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(offsets), "bkt")
      .withColumn("cum_before",
        col("off") + coalesce(sum(col("t")).over(inW), lit(0L)))
      .withColumn("shard", expr(s"cum_before div $budget"))
      .select(col("doc"), col("t"), col("shard"))
  }

  /** Per-shard manifest over an assignment `(doc, t, shard)` — the trainer's
    * table of contents. Defined ONCE and applied to BOTH the in-memory
    * assignment and the layout read back from disk, so a spec can assert the
    * two are equal (sink-independent twin): the oracle hash then gates the
    * assignment LOGIC while the twin-equality spec gates the SINK. */
  def manifest(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).cast("long").as("n_tokens"),
        min(col("doc")).as("first_doc"), max(col("doc")).as("last_doc"))
}
