package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard window-rank top-k idiom
  *
  * {{{ SELECT <cols> FROM (
  *       SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) rn FROM t)
  *     WHERE rn <= K   -- and <cols> does not use rn }}}
  *
  * into [[TopKPerKeyNode]] — so SQL-text and plain-DataFrame users get the
  * heap operator (k rows per key per partition cross the exchange, no
  * per-group sort) without calling [[TopKPerKey.topKPerKey]] themselves.
  * This is the `injectOptimizerRule` leg of the extension story: expression
  * (functions), strategy (physical planning), rule (plan rewriting).
  *
  * Deliberately conservative — the pattern must be exactly
  * Project(Filter(rn-bound, Window(single row_number|rank))) with the rank
  * dropped by the projection; anything else (rank kept in the output, extra
  * window expressions, compound filters, dense_rank) is left for Catalyst's
  * stock planning. row_number bounds keep SOME k rows consistent with the
  * ordering (deterministic only when the order is total — add unique
  * tie-breaks, as `q_topk_per_key` does); rank() bounds map to the
  * operator's `withTies` mode, which keeps every boundary tie and is
  * set-deterministic with no tie-break columns (`rank(r) ≤ k ⟺ r's order
  * value ≤ the k-th row's value`).
  *
  * Requires [[TopKPerKeyStrategy]] on the same session (both are wired by
  * [[graft.GraftExtensions]]).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  /** Above this k the rewrite declines: the heap operator pre-allocates
    * k-capacity per distinct key per partition and never spills, so a huge
    * user-supplied k on a high-cardinality key would trade Spark's
    * spillable sort-based window for executor OOM. Small-k is the entire
    * point of the operator; the stock window is the right plan beyond it. */
  val MaxK = 1024

  /** cond is a top-k bound on `rn`: rn <= K, rn < K+1, rn = 1, and each
    * mirrored literal-first spelling (K >= rn, K > rn, 1 = rn) — equivalent
    * user SQL must not silently miss the rewrite. */
  private def boundK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  /** Which rank function backs the window expression: row_number → plain
    * top-k, rank → top-k KEEPING boundary ties (`withTies`). `dense_rank`
    * is deliberately declined: its bound keeps up to k whole value classes
    * (unbounded rows per class), which the bounded heap cannot honor —
    * Spark's sort-based WindowGroupLimit is the right plan there. */
  private def rankMode(e: NamedExpression): Option[Boolean] = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => Some(false)
    case Alias(WindowExpression(_: Rank, _), _) => Some(true)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(outList,
        Filter(cond, Window(Seq(rnExpr), part, order, child, _)))
        if rankMode(rnExpr).isDefined && order.nonEmpty && part.nonEmpty =>
      val withTies = rankMode(rnExpr).get
      val rn = rnExpr.toAttribute
      boundK(cond, rn) match {
        case Some(k) if k > 0 && k <= MaxK &&
            !outList.exists(_.references.contains(rn)) &&
            outList.forall(_.references.subsetOf(child.outputSet)) =>
          // Spark's own InferWindowGroupLimit (3.5+) usually ran first and
          // wedged a WindowGroupLimit under the Window — the heap operator
          // subsumes it (its sorts + limit pass would be pure overhead), so
          // strip a matching one and take its child.
          val base = child match {
            case WindowGroupLimit(p2, o2, _, limit, grandchild)
                if p2 == part && o2 == order && limit >= k => grandchild
            case other => other
          }
          Project(outList, TopKPerKeyNode(part, order, k, base, withTies))
        case _ => p
      }
  }
}
