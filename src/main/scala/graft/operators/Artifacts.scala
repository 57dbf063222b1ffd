package graft.operators

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Session-scoped registry of materialized intermediates shared across
  * catalog queries.
  *
  * The dedup family forms one pipeline: MinHash signatures feed LSH candidate
  * pairs feed the keep-list. Run as independent catalog entries they would
  * each rebuild the full shingle→hash→signature pipeline from the raw corpus
  * (3-4 scans of the same shingle stream per bench round). [[shared]]
  * materializes the reduced artifact once per key and lets every downstream
  * query — and both sides of any self-join — reuse it.
  *
  * Materialization is `localCheckpoint(eager = true)`: partitions are stored
  * on the executors and the lineage is truncated, so a self-join over the
  * artifact cannot re-execute the upstream subtree (Spark otherwise
  * recomputes a shared plan subtree once per join side — the round-1
  * persist+count() workaround, now retired). At real scale the same boundary
  * is a bucketed table write; only REDUCED artifacts are ever materialized
  * (signatures: 16 rows/doc; candidate pairs: near-dup suspects only) —
  * never the data-scale shingle stream, which stays single-pass streaming
  * into the signature aggregation.
  */
object Artifacts {
  private val cache = TrieMap.empty[String, DataFrame]

  /** Get-or-build: first caller pays the pipeline, later callers reuse the
    * checkpointed partitions. Keys must include the input dir; the active
    * SparkSession's UUID is appended automatically so an artifact checkpointed
    * by a stopped/previous session (dead executor blocks) is never handed to a
    * new one — the new session just rebuilds under its own key. */
  def shared(key: String)(build: => DataFrame): DataFrame = {
    val session = System.identityHashCode(org.apache.spark.sql.SparkSession.active)
    cache.getOrElseUpdate(s"$session/$key", build.localCheckpoint(eager = true))
  }

  /** Drop every shared artifact — bench repetitions call this so each rep
    * pays the full pipeline cost honestly. */
  def clear(): Unit = {
    cache.values.foreach(_.unpersist(blocking = false))
    cache.clear()
  }
}
