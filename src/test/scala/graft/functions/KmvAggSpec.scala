package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The custom TypedImperativeAggregate's algebra: KMV's fold is
  * commutative, associative, and idempotent, so the sketch must be
  * invariant to partitioning (the serialized-buffer merge path) and to
  * duplicate re-feeds, and exact below k. */
class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8

  private def sketch(df: DataFrame): Map[String, (Int, Long)] = {
    val sk = ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(col("h")), K).toAggregateExpression())
    df.groupBy(col("g")).agg(sk.as("sk"))
      .select(col("g"), col("sk.nh"), col("sk.hk"))
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
  }

  private val rows: Seq[(String, Long)] =
    (1L to 100L).map(h => ("a", h * 7919 % 1000)) ++ // dups via mod
      (1L to 5L).map(h => ("b", h * 104729))

  test("partitioning-invariant: 1 partition == 13 partitions (merge path)") {
    val df = rows.toDF("g", "h")
    assert(sketch(df.repartition(1)) == sketch(df.repartition(13)))
  }

  test("duplicate re-feed is a no-op; below-k groups are exact") {
    val df = rows.toDF("g", "h")
    val once = sketch(df)
    assert(sketch(df.union(df)) == once, "KMV must be idempotent")
    // group b has 5 distinct hashes < k=8: exact count, hk = max
    assert(once("b") == ((5, 5L * 104729)))
    // group a saturates: exactly k kept, hk = the k-th smallest distinct
    val distinctA = rows.filter(_._1 == "a").map(_._2).distinct.sorted
    assert(once("a") == ((K, distinctA(K - 1))))
  }
}
