package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-weighted sampling (`ml_weighted_sample`): determinism, realized
  * rate, and Horvitz–Thompson unbiasedness of the emitted weights. */
class WeightedSampleSpec extends SparkSpec {

  test("deterministic; realized keep rate and HT estimate within binomial noise") {
    val a = MlQueries.mlWeightedSample(spark, sf("sf0.01")).cache()
    val b = MlQueries.mlWeightedSample(spark, sf("sf0.01"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0, "rerun-stable")

    val rows = a.collect()
    val n = rows.length
    val expKeep = rows.map(_.getLong(1)).sum / 1e6
    val variance = rows.map(r => { val p = r.getLong(1) / 1e6; p * (1 - p) }).sum
    val kept = rows.count(_.getInt(2) == 1)
    assert(math.abs(kept - expKeep) <= 4 * math.sqrt(variance) + 1,
      s"kept=$kept expected=$expKeep sd=${math.sqrt(variance)}")

    // Horvitz–Thompson: sum of inverse-propensity weights over the kept
    // set estimates the corpus size
    val ht = rows.filter(_.getInt(2) == 1).map(_.getLong(3) / 1e6).sum
    assert(math.abs(ht - n) < 0.35 * n, s"HT corpus estimate $ht vs $n")

    // higher-rate docs really keep more often: split at the median rate
    val sorted = rows.sortBy(_.getLong(1))
    val (lo, hi) = sorted.splitAt(n / 2)
    val loRate = lo.count(_.getInt(2) == 1).toDouble / lo.length
    val hiRate = hi.count(_.getInt(2) == 1).toDouble / hi.length
    assert(hiRate > loRate, s"monotone in quality: lo=$loRate hi=$hiRate")
    a.unpersist()
  }
}
