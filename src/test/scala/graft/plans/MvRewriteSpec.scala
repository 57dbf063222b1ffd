package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The automatic MV rewrite's matching contract: the conservative
  * declines matter as much as the rewrite itself — a filtered query or a
  * measure the MV doesn't store MUST keep the fact scan (serving it from
  * the MV would be wrong), while the matched shapes must lose it. */
class MvRewriteSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def mvPlan: LogicalPlan =
    spark.range(1).selectExpr("'x' as month", "'A' as l_returnflag",
      "cast(1 as long) as n_items", "cast(1.0 as double) as sum_qty",
      "cast(1 as decimal(18,4)) as rev").queryExecution.analyzed

  private def rule = MvRollupRewrite(mvPlan, "lineitem.parquet")

  private def li = spark.read.parquet(s"$dir/lineitem.parquet")

  private def rewritten(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    !rule.apply(opt).fastEquals(opt)
  }

  private def monthlyAgg(df: DataFrame): DataFrame =
    df.groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))

  test("the exact-grain and contained (coarser) shapes rewrite") {
    assert(rewritten(monthlyAgg(li)), "exact grain must serve from the MV")
    assert(rewritten(li.groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(col("l_quantity")).as("sum_qty"))),
      "month-only grouping is contained in the MV grain")
  }

  test("a filtered query declines — the MV has no predicate") {
    assert(!rewritten(monthlyAgg(li.where(col("l_quantity") > 10))),
      "a Filter under the aggregate must keep the fact scan")
  }

  test("a measure the MV does not store declines") {
    assert(!rewritten(li.groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(sum(col("l_tax")).as("sum_tax"))),
      "sum(l_tax) is not an MV measure")
    assert(!rewritten(li.groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .agg(avg(col("l_quantity")).as("avg_qty"))),
      "avg is not sum-decomposable in this rule")
  }

  test("a finer or foreign grouping declines") {
    assert(!rewritten(li.groupBy(col("l_shipdate"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"))),
      "day grain is finer than the MV's month grain")
    assert(!rewritten(li.groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"))),
      "l_linestatus is not in the MV grain")
  }

  test("a bare (non-aliased) date_format grouping rewrites to the MONTH grain, never the flag") {
    // the DataFrame API always aliases grouping expressions (and the
    // optimizer pulls complex ones into a Project), but the rule must not
    // depend on that: hand-build the Aggregate with the raw expression in
    // the grouping list — the old catch-all silently mapped this shape to
    // l_returnflag, changing the grain
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, DateFormatClass, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.TimestampType
    val fact = li.select(col("l_shipdate"), col("l_quantity"))
      .queryExecution.optimizedPlan
    val ship = fact.output.find(_.name == "l_shipdate").get
    val qty = fact.output.find(_.name == "l_quantity").get
    val monthExpr = DateFormatClass(Cast(ship, TimestampType), Literal("yyyy-MM"))
    val plan = Aggregate(Seq(monthExpr),
      Seq(Alias(Sum(qty).toAggregateExpression(), "sum_qty")()), fact)
    val out = rule.apply(plan)
    assert(!out.fastEquals(plan), "the shape is contained — it must rewrite")
    val g = out.asInstanceOf[Aggregate].groupingExpressions
    assert(g.size == 1 && g.head.asInstanceOf[Attribute].name == "month",
      s"bare month grouping must map to the month grain, got $g")
  }
}
