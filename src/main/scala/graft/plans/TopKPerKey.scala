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
  * `withTies = true` switches to `rank()` semantics: every row tied with the
  * k-th row on the ORDER key is kept too (output per key may exceed k). The
  * heap carries a boundary-tie overflow whose invariant is "only rows equal
  * to the current heap root"; it clears whenever the boundary strictly
  * improves. Partial pruning stays correct because the partition-local
  * boundary is never better than the global one. Memory: the overflow is
  * unbounded under adversarial all-equal data — the same caveat as Spark's
  * own rank-mode WindowGroupLimit (`dense_rank` is declined entirely for
  * this reason: it holds up to k whole VALUE CLASSES).
  *
  * Registered via [[graft.GraftExtensions]] (`injectPlannerStrategy`) or
  * per-session with `spark.experimental.extraStrategies`; the DataFrame entry
  * point is [[TopKPerKey.topKPerKey]]. Memory contract: one k-heap per
  * distinct key per partition (the HashAggregate hash-map shape; no spill —
  * k and key cardinality per partition bound it).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: LogicalPlan,
                          withTies: Boolean = false) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child, withTies) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child), withTies)
      TopKPerKeyExec(keys, order, k, partial = false, partial, withTies) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan,
                          withTies: Boolean = false) extends UnaryExecNode {
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
    val ties = withTies
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(orderExprs, childOutput)
      // heap root = WORST kept row (reverse ordering), so a better candidate
      // replaces it in O(log k)
      final class KeyState {
        val heap = new java.util.PriorityQueue[InternalRow](kLocal, rowOrd.reversed())
        // rank() mode: rows tied with the current root on the ORDER key;
        // cleared whenever the boundary strictly improves
        var overflow: java.util.ArrayList[InternalRow] = _
        def add(row: InternalRow): Unit = {
          if (heap.size() < kLocal) { heap.offer(row.copy()); return }
          val cmp = rowOrd.compare(row, heap.peek())
          if (cmp < 0) {
            val oldRoot = heap.poll()
            heap.offer(row.copy())
            if (ties) {
              // the new root is ≤ the old one; if they still tie, the
              // evicted row sits ON the boundary and must be retained —
              // if strictly better, every old boundary tie is out
              if (rowOrd.compare(heap.peek(), oldRoot) == 0) {
                if (overflow == null) overflow = new java.util.ArrayList[InternalRow]()
                overflow.add(oldRoot) // already a copy (heap stores copies)
              } else if (overflow != null) overflow.clear()
            }
          } else if (ties && cmp == 0) {
            if (overflow == null) overflow = new java.util.ArrayList[InternalRow]()
            overflow.add(row.copy())
          }
        }
        def rows: Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          val h = heap.iterator().asScala
          if (overflow == null) h else h ++ overflow.iterator().asScala
        }
      }
      val states = new java.util.HashMap[UnsafeRow, KeyState]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var st = states.get(key)
        if (st == null) {
          st = new KeyState
          states.put(key.copy(), st)
        }
        st.add(row)
      }
      import scala.jdk.CollectionConverters._
      states.values().iterator().asScala.flatMap(_.rows)
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
    * results — or pass `withTies = true` for rank() semantics, where the
    * boundary ties are all KEPT and the result is set-deterministic without
    * tie-break columns). Requires [[TopKPerKeyStrategy]] on the session —
    * via [[graft.GraftExtensions]] or `spark.experimental.extraStrategies`. */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
                 withTies: Boolean = false): DataFrame = {
    val keyExprs = keys.map(ColumnBridge.expressionEager)
    val sortOrder = order.map(ColumnBridge.sortOrder)
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrder, k, ColumnBridge.logicalPlan(df), withTies))
  }
}
