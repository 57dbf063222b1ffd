package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a genuine custom operator — the case SURVEY §7.2 reserved
  * this package for: semantics Catalyst's built-ins only express as
  * `row_number() OVER (PARTITION BY keys ORDER BY ord) <= k`, which plans a
  * shuffle of EVERY row followed by a FULL SORT of every group. The dedicated
  * operator is the per-key analog of `TakeOrderedAndProject`:
  *
  *  - a PARTIAL phase keeps a bounded k-heap per key per input partition, so
  *    at most k rows per (key, partition) reach the exchange — at 100 TB the
  *    shuffle carries k·|keys|·partitions rows instead of N;
  *  - EnsureRequirements inserts the key-clustered exchange between the
  *    phases (`requiredChildDistribution`, exactly how partial/final
  *    aggregation composes);
  *  - the FINAL phase merges the per-partition heaps — no sort anywhere,
  *    O(n log k) per partition instead of O(n log n).
  *
  * Registered via [[graft.GraftExtensions]] (`injectPlannerStrategy`) or
  * per-session with `spark.experimental.extraStrategies`; the DataFrame entry
  * point is [[TopKPerKey.topKPerKey]]. Memory contract: one k-heap per
  * distinct key per partition (the HashAggregate hash-map shape; no spill —
  * k and key cardinality per partition bound it).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(orderExprs, childOutput)
      // heap root = WORST kept row (reverse ordering), so a better candidate
      // replaces it in O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, rowOrd.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.offer(row.copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `df` reduced to the top-k rows per key under `order` (build with
    * `col(...).desc` / `.asc`; add unique tie-break columns for deterministic
    * results). Requires [[TopKPerKeyStrategy]] on the session — via
    * [[graft.GraftExtensions]] or `spark.experimental.extraStrategies`. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val keyExprs = keys.map(ColumnBridge.expressionEager)
    val sortOrder = order.map(ColumnBridge.sortOrder)
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, ColumnBridge.logicalPlan(df)))
  }
}
