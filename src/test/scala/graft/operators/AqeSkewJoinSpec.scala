package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** AQE skew-join vs manual salting — when to rely on which at 100×.
  *
  * `q_salted_join` proves the MANUAL pattern (deterministic salt + small-side
  * replication). Spark's AQE skew-join handles the same straggler problem at
  * runtime by splitting oversized shuffle partitions of a sort-merge join,
  * with no query rewrite. This spec pins that the runtime path actually
  * fires (`skew=true` in the final adaptive plan) and produces EXACTLY the
  * salted plan's rows.
  *
  * Division of labor at scale:
  *  - AQE skew-join: per-PARTITION skew in shuffled joins — free, use first.
  *    Limits: only joins (not aggregations), only sizes the planner can see
  *    post-shuffle, splits cost a small-side re-read per split.
  *  - Manual salting: per-KEY skew the optimizer can't split (skewed
  *    groupBy/HashAggregate — AQE never splits an aggregate's partitions),
  *    broadcast-replicated joins, or when the salt must be deterministic for
  *    retry-exactness / oracle checking. Also the only option for skewed
  *    AGGREGATIONS (`q_skew_agg`).
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition (skew=true) and matches the salted join") {
    import spark.implicits._
    // one pathological key: 200k of 210k rows land on key 0
    val big = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(10000).select((col("id") % 100 + 1).as("k"), col("id").as("v")))
    val small = spark.range(101).select(col("id").as("k"), (col("id") * 7).as("w"))

    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // local-scale thresholds: the hot partition (~3 MB) must register as
      // skewed; production keeps the 256 MB default and the same mechanics
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") { // force the shuffled join

      // NOTE: the skewed join must be the query's LAST shuffle stage — a
      // same-key aggregation stacked on top makes AQE keep the partitioning
      // (splitting would break the agg's required distribution), so the
      // split is asserted on the bare join and the checksum folded driver-side
      val joined = big.join(small, "k")
        .select(col("k"), (col("v") + col("w")).as("s"))
      val rows = joined.collect() // AQE re-plans during execution
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew split must fire on the hot partition:\n$finalPlan")

      // identical rows from the manual salted plan (AQE off → pure salting)
      val expected = withConf("spark.sql.adaptive.enabled" -> "false") {
        Salting.saltedJoin(big, small, "k", factor = 8,
            bigSaltSource = pmod(col("v"), lit(8)))
          .select(col("k"), (col("v") + col("w")).as("s"))
          .collect()
      }
      def fold(rs: Array[org.apache.spark.sql.Row]) =
        (rs.length, rs.map(_.getLong(0)).sum, rs.map(_.getLong(1)).sum)
      assert(rows.length == 210000)
      assert(fold(rows) == fold(expected),
        "AQE-split join must produce exactly the salted plan's rows")
    }
  }
}
