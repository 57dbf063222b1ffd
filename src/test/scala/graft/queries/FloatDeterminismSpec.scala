package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** SURVEY §8 float-determinism, pinned mechanically: the ratio-of-sums
  * queries must produce IDENTICAL rows under different shuffle-partition
  * counts (different partial-aggregation orders). Round 2's `som_update` /
  * `ml_standardize` hash-fails were exactly this class of drift — the
  * quantize-the-sums / DECIMAL-sums discipline makes the results
  * order-independent by construction, and this spec re-rolls the dice on
  * every run instead of once per round.
  */
class FloatDeterminismSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def withPartitions[A](n: Int)(f: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private def invariant(name: String, q: (org.apache.spark.sql.SparkSession, String) => DataFrame): Unit = {
    val dir = sf("sf0.001")
    val at4 = withPartitions(4)(rows(q(spark, dir)))
    val at32 = withPartitions(32)(rows(q(spark, dir)))
    assert(at4.nonEmpty, s"$name returned no rows")
    assert(at4 == at32, s"$name differs between 4 and 32 shuffle partitions")
  }

  test("som_update is invariant to shuffle-partition count") {
    invariant("som_update", SomQueries.updateStep)
  }

  test("ml_standardize is invariant to shuffle-partition count") {
    invariant("ml_standardize", MlQueries.mlStandardize)
  }

  test("som_fit5 is invariant to shuffle-partition count") {
    invariant("som_fit5", MlQueries.somFit5)
  }

  test("som_fit_predict (estimator path) is invariant to shuffle-partition count") {
    invariant("som_fit_predict", MlQueries.somFitPredict)
  }
}
