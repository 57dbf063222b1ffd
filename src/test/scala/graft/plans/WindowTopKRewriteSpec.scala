package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The optimizer rule swaps the window-rank top-k idiom for the heap
  * operator — DataFrame and SQL-text forms — and leaves non-matching
  * window queries alone. */
class WindowTopKRewriteSpec extends SparkSpec {

  private def fork = {
    val f = spark.newSession()
    f.experimental.extraOptimizations = Seq(WindowTopKRewrite)
    f.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    f
  }

  private val w = Window.partitionBy(col("l_suppkey"))
    .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))

  test("DataFrame window-rank + drop(rn) plans as the heap operator, same rows") {
    val f = fork
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val q = li.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite must fire:\n$plan")
    // the Window AND Spark's own WindowGroupLimit (with its sorts) must both
    // be gone — the heap operator subsumes them
    assert(!plan.contains("Window"), s"window machinery must be gone:\n$plan")
    assert(!plan.contains("Sort "), s"no sorts in the heap path:\n$plan")
    // reference = same idiom on the stock session (no rule)
    val ref = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3).drop("rn")
    assert(q.collect().toSet == ref.collect().toSet)
  }

  test("SQL-text window-rank top-k is rewritten too") {
    val f = fork
    f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .createOrReplaceTempView("li_topk")
    val q = f.sql("""
      SELECT l_suppkey, l_orderkey, l_extendedprice FROM (
        SELECT l_suppkey, l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_suppkey
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM li_topk) WHERE rn <= 2""")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite must fire on SQL text:\n$plan")
    assert(q.count() > 0)
  }

  test("mirrored literal-first bounds (K > rn, 1 = rn) are rewritten too") {
    val f = fork
    f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .createOrReplaceTempView("li_topk_m")
    for (cond <- Seq("4 > rn", "1 = rn")) {
      val q = f.sql(s"""
        SELECT l_suppkey, l_orderkey, l_extendedprice FROM (
          SELECT l_suppkey, l_orderkey, l_extendedprice,
                 row_number() OVER (PARTITION BY l_suppkey
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
          FROM li_topk_m) WHERE $cond""")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKeyFinal"), s"rewrite must fire on `$cond`:\n$plan")
      assert(q.count() > 0)
    }
  }

  test("k above MaxK is NOT rewritten (heap has no spill path)") {
    val f = fork
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val q = li.withColumn("rn", row_number().over(w))
      .where(col("rn") <= WindowTopKRewrite.MaxK + 1).drop("rn")
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "huge k must stay on the spillable window plan")
  }

  test("rank kept in the output is NOT rewritten (rn must survive)") {
    val f = fork
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val q = li.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), s"must keep the window when rn is consumed:\n$plan")
  }

  test("rank() IS rewritten to the withTies heap; boundary ties all survive") {
    val f = fork
    // l_quantity is integer-valued 1..50 → real ties at every boundary
    val wq = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
    val q = li.withColumn("rn", rank().over(wq)).where(col("rn") <= 3).drop("rn")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rank rewrite must fire:\n$plan")
    assert(!plan.contains("Window"), s"window machinery must be gone:\n$plan")
    // reference = the stock window plan; rank ≤ k is a deterministic SET
    val ref = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .withColumn("rn", rank().over(
        Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))))
      .where(col("rn") <= 3).drop("rn")
    val got = q.collect().toSet
    val want = ref.collect().toSet
    assert(got == want, s"tie sets must match: got ${got.size}, want ${want.size}")
    // and the ties actually exercise the path: some supplier must keep > 3 rows
    assert(q.groupBy("l_suppkey").count().where(col("count") > 3).count() > 0,
      "fixture must produce at least one boundary tie beyond k")
  }

  test("dense_rank() is NOT rewritten (k whole value classes — unbounded rows)") {
    val f = fork
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val q = li.withColumn("rn", dense_rank().over(w)).where(col("rn") <= 3).drop("rn")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"),
      s"dense_rank keeps whole value classes — the bounded heap cannot:\n$plan")
  }

  test("a compound filter is NOT rewritten (conservative match)") {
    val f = fork
    val li = f.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val q = li.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3 && col("l_extendedprice") > 0).drop("rn")
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
