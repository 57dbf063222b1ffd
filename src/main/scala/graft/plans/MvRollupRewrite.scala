package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Optimizer rule: AUTOMATIC materialized-view rewrite for the monthly
  * lineitem rollup — the third leg of the extension story after the
  * expression ([[graft.functions]]) and strategy ([[TopKPerKeyStrategy]])
  * legs, and the automated form of `q_incr_rollup`'s manual MV discipline.
  *
  * A query shaped
  * {{{ lineitem.groupBy(date_format(l_shipdate,'yyyy-MM') as month
  *                      [, l_returnflag])
  *             .agg(count(1) | sum(l_quantity) | sum(rev-expr), ...) }}}
  * is rewritten to re-aggregate the (month, l_returnflag)-grain MV
  * instead of scanning the fact table: `count(1)` becomes
  * `sum(mv.n_items)`, `sum(l_quantity)` becomes `sum(mv.sum_qty)`, the
  * decimal(18,4) revenue measure becomes `sum(mv.rev)` — the partial-sum
  * algebra that makes rollup MVs composable. Grouping may be the MV's
  * exact grain or any subset of it (the coarser month-only query
  * re-aggregates across flags), which is precisely the containment rule
  * production MV matchers apply.
  *
  * Deliberately conservative, like [[WindowTopKRewrite]]: the child must
  * be a bare scan of the fact table (a Filter anywhere declines — the MV
  * has no predicate, so only predicate-free aggregates are contained);
  * grouping expressions must be exactly the MV grain's; every aggregate
  * must be one of the three MV measures (fingerprinted by function,
  * referenced columns, and result type — `sum(rev)` only matches the
  * decimal(18,4)-cast spelling whose partial sums the MV stores EXACTLY,
  * so the rewrite can never move a float sum). Output attribute ids are
  * preserved, so parent plans resolve unchanged. Rewritten aggregate
  * types equal the original's (Sum over the MV's decimal(18,4) widens to
  * the same decimal(28,4) the query's Sum-of-cast produced; Sum over
  * long n_items is the LongType Count produced).
  *
  * At 100 TB this is THE aggregate-serving lever: the fact scan
  * disappears and the query costs O(months × flags) — the rewrite is
  * decided at plan time from plan shape alone, no query change. */
case class MvRollupRewrite(mv: LogicalPlan, factSuffix: String)
    extends Rule[LogicalPlan] {

  private def mvAttr(name: String): Attribute =
    mv.output.find(_.name == name)
      .getOrElse(sys.error(s"MV lacks column $name"))

  /** A bare (possibly column-pruned) scan of the fact parquet. */
  private def isFactScan(p: LogicalPlan): Boolean = p match {
    case Project(_, c) => isFactScan(c)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(_.toString.endsWith(factSuffix))
      case _ => false
    }
    case _ => false
  }

  /** The attribute under any tower of casts (the analyzer wraps the date
    * column in a timestamp cast before date_format). */
  private def rootAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => rootAttr(c.child)
    case _ => None
  }

  private def isMonthExpr(e: Expression): Boolean = e match {
    case DateFormatClass(c, Literal(fmt, _), _) =>
      rootAttr(c).exists(_.name == "l_shipdate") &&
        String.valueOf(fmt) == "yyyy-MM"
    case _ => false
  }

  /** The MV measure replacing one aggregate function, if it is one of the
    * three the MV stores. */
  private def measure(fn: AggregateFunction): Option[AggregateFunction] = fn match {
    case c: Count if c.children == Seq(Literal(1)) =>
      Some(Sum(mvAttr("n_items")))
    case s: Sum => s.child match {
      case a: AttributeReference if a.name == "l_quantity" =>
        Some(Sum(mvAttr("sum_qty")))
      case c: Cast if c.dataType == DecimalType(18, 4) &&
          c.child.references.map(_.name).toSet ==
            Set("l_extendedprice", "l_discount") =>
        Some(Sum(mvAttr("rev")))
      case _ => None
    }
    case _ => None
  }

  /** Map one output column to its MV-side form, keeping name + exprId.
    * Output columns may be ARBITRARY expressions over the MV's grain and
    * measures (CollapseProject folds the user's derived columns — casts,
    * rounds, integer scalings — into the aggregate list): every embedded
    * aggregate function must be one of the three MV measures and every
    * grouping reference must resolve to the grain; anything the MV can't
    * express leaves a dangling fact-side reference and declines the
    * whole rewrite. */
  private def mapOut(e: NamedExpression, monthIds: Set[ExprId],
                     flagIds: Set[ExprId]): Option[NamedExpression] = {
    var ok = true
    def swap(expr: Expression): Expression = expr.transform {
      case ae @ AggregateExpression(fn, _, false, None, _) =>
        measure(fn) match {
          case Some(m) => m.toAggregateExpression()
          case None => ok = false; ae
        }
      case ae: AggregateExpression => ok = false; ae
      case a: AttributeReference if monthIds.contains(a.exprId) => mvAttr("month")
      case a: AttributeReference if flagIds.contains(a.exprId) =>
        mvAttr("l_returnflag")
      case e2 if isMonthExpr(e2) => mvAttr("month")
    }
    val out = e match {
      case a: AttributeReference =>
        swap(a) match {
          case r: Attribute => Alias(r, a.name)(exprId = a.exprId)
          case r => Alias(r, a.name)(exprId = a.exprId)
        }
      case al @ Alias(child, name) =>
        Alias(swap(child), name)(exprId = al.exprId)
      case other => ok = false; other
    }
    val mvIds = mv.outputSet
    if (ok && out.references.subsetOf(mvIds)) Some(out) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(grouping, aggExprs, child, _) if isFactScan(child) =>
      // PullOutGroupingExpressions moved complex grouping exprs into a
      // Project below the Aggregate — resolve grouping attributes through
      // that Project's aliases before classifying them
      val defs: Map[ExprId, Expression] = child match {
        case Project(exprs, _) =>
          exprs.collect { case al: Alias => al.exprId -> al.child }.toMap
        case _ => Map.empty
      }
      def resolved(e: Expression): Expression = e match {
        case a: AttributeReference => defs.getOrElse(a.exprId, a)
        case other => other
      }
      val monthIds = grouping.collect {
        case a: AttributeReference if isMonthExpr(resolved(a)) => a.exprId
        case al: Alias if isMonthExpr(al.child) => al.exprId
      }.toSet
      def isFlagAttr(a: AttributeReference): Boolean = resolved(a) match {
        case r: AttributeReference => r.name == "l_returnflag"
        case _ => false
      }
      val flagIds = grouping.collect {
        case a: AttributeReference if isFlagAttr(a) => a.exprId
      }.toSet
      val groupingOk = grouping.nonEmpty &&
        grouping.forall(g => g match {
          case a: AttributeReference =>
            monthIds.contains(a.exprId) || flagIds.contains(a.exprId)
          case al: Alias => isMonthExpr(al.child)
          case e => isMonthExpr(e)
        })
      val mapped = aggExprs.map(mapOut(_, monthIds, flagIds))
      // every grouping expression must map to a grain column EXPLICITLY —
      // an unmapped shape (e.g. a bare non-aliased date_format) declines the
      // rewrite rather than silently coarsening to l_returnflag
      val newGrouping: Seq[Option[Expression]] = grouping.map {
        case a: AttributeReference if monthIds.contains(a.exprId) =>
          Some(mvAttr("month"))
        case a: AttributeReference if flagIds.contains(a.exprId) =>
          Some(mvAttr("l_returnflag"))
        case al: Alias if isMonthExpr(al.child) => Some(mvAttr("month"))
        case e if isMonthExpr(e) => Some(mvAttr("month"))
        case _ => None
      }
      if (groupingOk && newGrouping.forall(_.isDefined) &&
          mapped.forall(_.isDefined)) {
        Aggregate(newGrouping.map(_.get), mapped.map(_.get), mv)
      } else agg
  }
}
