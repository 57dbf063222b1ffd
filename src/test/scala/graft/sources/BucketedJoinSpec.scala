package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB co-location story, made mechanical: writing both fact tables
  * bucketed by the join key lets the join run with NO exchange on either
  * side — at real scale this converts the nightly lineitem⋈orders shuffle
  * (the single largest data movement in the pipeline) into a local
  * per-bucket merge. This spec pins the plan property so a regression in
  * how we write or read bucketed layouts fails CI.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans with zero exchanges") {
    val dir = sf("sf0.001")
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graft_li_bucketed")
    spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graft_ord_bucketed")
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the merge path
        "spark.sql.adaptive.enabled" -> "false") {      // plan inspectable pre-AQE
        val j = spark.table("graft_li_bucketed")
          .join(spark.table("graft_ord_bucketed"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("l_quantity")).as("qty"))
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), s"expected a merge join:\n$p")
        // the join itself must not move data; the only exchange allowed is
        // the post-join aggregation's (on o_custkey)
        val joinPart = p.substring(p.indexOf("SortMergeJoin"))
        assert(!joinPart.contains("Exchange"),
          s"bucketed join must not shuffle either side:\n$p")
        assert(j.count() > 0)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
