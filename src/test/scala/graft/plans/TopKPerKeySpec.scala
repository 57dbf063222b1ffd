package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k operator: result-equal to the window-rank
  * formulation it replaces, planned as partial→exchange→final heap phases
  * with NO sort node, and correct on the edges (k ≥ group size, ties broken
  * by the unique tie-break columns, single-partition input). */
class TopKPerKeySpec extends SparkSpec {

  private def withStrategy[A](f: => A): A = {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = prev :+ TopKPerKeyStrategy
    try f finally spark.experimental.extraStrategies = prev
  }

  private def li: DataFrame =
    spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))

  private def rows(df: DataFrame): Set[String] = df.collect().map(_.toString).toSet

  test("matches window row_number <= k on real data") {
    withStrategy {
      val custom = TopKPerKey.topKPerKey(li,
        Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
        k = 3)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      val windowed = li.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3).drop("rn")
      assert(rows(custom).nonEmpty)
      assert(rows(custom) == rows(windowed))
    }
  }

  test("plans as partial + final heap phases around an exchange, no sort") {
    withStrategy {
      val p = TopKPerKey.topKPerKey(li, Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc), k = 2)
        .queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyPartial"), "partial phase must pre-prune before the shuffle")
      assert(p.contains("TopKPerKeyFinal"), "final phase must merge after the shuffle")
      assert(p.contains("Exchange"), "key-clustered exchange must sit between the phases")
      assert(!p.contains("Sort "), s"no sort node may appear:\n$p")
    }
  }

  test("k larger than every group returns all rows") {
    withStrategy {
      import spark.implicits._
      val tiny = Seq((1L, 10.0), (1L, 20.0), (2L, 5.0)).toDF("k", "v")
      val out = TopKPerKey.topKPerKey(tiny, Seq(col("k")), Seq(col("v").desc), k = 99)
      assert(out.count() == 3)
    }
  }

  test("exact ties are broken by the tie-break column deterministically") {
    withStrategy {
      import spark.implicits._
      val ties = Seq((1L, 7.0, 1L), (1L, 7.0, 2L), (1L, 7.0, 3L)).toDF("k", "v", "id")
        .repartition(4)
      val kept = TopKPerKey.topKPerKey(ties, Seq(col("k")),
        Seq(col("v").desc, col("id").asc), k = 2)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(kept == Seq(1L, 2L))
    }
  }

  test("fails fast on k <= 0") {
    withStrategy {
      import spark.implicits._
      val tiny = Seq((1L, 1.0)).toDF("k", "v")
      intercept[IllegalArgumentException] {
        TopKPerKey.topKPerKey(tiny, Seq(col("k")), Seq(col("v").desc), k = 0)
      }
    }
  }
}
