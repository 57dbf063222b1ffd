package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-strategy control for the mid-size dimension case: a dimension too
  * big to broadcast but far smaller than the fact side. Default planning
  * falls back to sort-merge — which SORTS THE FACT SIDE (the 100 TB cost);
  * the SHUFFLE_HASH hint keeps the fact side sort-free (build a hash table
  * per partition from the small side, stream the big side through it).
  * This spec pins that the hint is honored so the pattern stays available.
  */
class JoinStrategySpec extends SparkSpec {

  test("SHUFFLE_HASH hint joins without sorting the fact side") {
    val dir = sf("sf0.001")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // dimension "too big"
      "spark.sql.adaptive.enabled" -> "false") {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_suppkey"), col("l_extendedprice"))
      val supp = spark.read.parquet(s"$dir/supplier.parquet")
        .select(col("s_suppkey"), col("s_nationkey"))
      val smj = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      assert(smj.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "without the hint this case falls back to sort-merge (else the test is vacuous)")
      val shj = li.join(supp.hint("SHUFFLE_HASH"), col("l_suppkey") === col("s_suppkey"))
      val p = shj.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"), s"hint must be honored:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("Sort "),
        s"fact side must stream unsorted:\n$p")
      assert(shj.count() == smj.count())
    }
  }
}
