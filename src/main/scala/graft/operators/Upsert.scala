package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Snapshot MERGE (upsert) without a table format: the daily-maintenance
  * primitive that keeps a parquet-backed table current from change deltas —
  * `new = (old ∖ delta.keys) ∪ delta` (last-writer-wins, delta rows replace
  * matching snapshot rows, inserts carry through the same union).
  *
  * Shaped as ONE anti join + union rather than the full-outer-join +
  * per-column coalesce form: the anti join broadcasts the (delta-sized) key
  * set against the snapshot scan — the snapshot never shuffles — and the
  * union is a metadata concat. At 100 TB the snapshot-side shuffle is
  * exactly what a MERGE must avoid; with a partitioned snapshot the anti
  * join also prunes to the partitions the delta touches. (A table format
  * adds transactionality/file-level skipping on top; the dataflow is this.)
  */
object Upsert {

  /** Apply `delta` over `snapshot` by `keys`, delta winning on collision.
    * Schemas must match by name (`unionByName`). */
  def apply(snapshot: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    snapshot
      .join(broadcast(delta.select(keys.map(delta(_)): _*).distinct()), keys, "left_anti")
      .unionByName(delta)
}
