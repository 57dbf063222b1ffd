package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The learned quality classifier (`text_quality_clf`): the 1/16-bit
  * integer logarithm it scores with, and the discrimination the learned
  * cut achieves against its rule-filter teacher. */
class QualityClfSpec extends SparkSpec {
  import spark.implicits._

  test("log2q16 matches the bit-exact scalar spelling; monotone; within one of floor(16*log2)") {
    val L = TextDedupQueries.Log2MantissaQ16
    def ref(q: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
      val m = ((q * 16) >> e).toInt // == floor(q*16 / 2^e), exactly
      16L * e + L(m - 16)
    }
    val rows = (1L to 200000L).toDF("q")
      .select(col("q"), TextDedupQueries.log2q16(col("q")).as("lg"))
      .collect()
    var prev = Long.MinValue
    rows.foreach { r =>
      val q = r.getLong(0)
      val lg = r.getLong(1)
      assert(lg == ref(q), s"q=$q")
      // exact floor(16*log2 q) via BigInt: largest k with 2^k <= q^16
      val exact = {
        val target = BigInt(q).pow(16)
        var k = 16 * (63 - java.lang.Long.numberOfLeadingZeros(q))
        while (BigInt(2).pow(k + 1) <= target) k += 1
        k
      }
      assert(lg <= exact && lg >= exact - 2, s"q=$q lg=$lg exact=$exact")
      assert(lg >= prev, s"monotonicity at q=$q")
      prev = lg
      if (java.lang.Long.bitCount(q) == 1)
        assert(lg == 16L * (63 - java.lang.Long.numberOfLeadingZeros(q)), s"power of two q=$q")
    }
  }

  test("calibration: decile keep-rate is monotone non-decreasing; bottom < top") {
    val rows = TextDedupQueries.clfCalibration(spark, sf("sf0.01"))
      .orderBy(col("decile")).collect()
    assert(rows.length == 10)
    val rates = rows.map(r => r.getLong(2).toDouble / r.getLong(1))
    rates.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 0.05, s"keep rate must not collapse between deciles: $a -> $b")
    }
    assert(rates.head < rates.last,
      s"a flat curve means the features learned nothing: ${rates.toSeq}")
    // value-cutpoint semantics: equal scores always share a decile, so
    // consecutive ranges are DISJOINT (strictly ordered), not just tiled
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) < b.getLong(3),
        "a score value must never straddle two deciles")
    }
  }

  test("reliability: iso_ppm equals driver-side PAV over the gated decile table; monotone") {
    val dir = sf("sf0.001")
    val got = TextDedupQueries.clfReliability(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.length == 10)
    // raw_ppm is the exact floor rate of the calibration table's counts
    val cal = TextDedupQueries.clfCalibration(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (d, n, pos, raw, _) =>
      assert(cal(d) == (n, pos), s"decile $d counts")
      assert(raw == (1000000L * pos) / n, s"decile $d raw rate")
    }
    // calibrated probabilities are monotone nondecreasing in the decile
    assert(got.sliding(2).forall {
      case Array(a, b) => a._5 <= b._5; case _ => true })
    // pool-adjacent-violators over the same counts (mlIsotonic's spec
    // discipline: exact cross-multiplied merges, e6 floor at the end)
    case class Pool(n: Long, pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    for ((_, n, pos, _, _) <- got) {
      pools += Pool(n, pos); sizes += 1
      while (pools.length > 1 &&
        pools(pools.length - 2).pos * pools.last.n >=
          pools.last.pos * pools(pools.length - 2).n) {
        val b = pools.remove(pools.length - 1); val a = pools.remove(pools.length - 1)
        pools += Pool(a.n + b.n, a.pos + b.pos)
        val sb = sizes.remove(sizes.length - 1)
        sizes += sizes.remove(sizes.length - 1) + sb
      }
    }
    val pav = pools.toSeq.zip(sizes).flatMap { case (p, k) =>
      Seq.fill(k)((1000000L * p.pos) / p.n) }
    assert(got.map(_._5).toSeq == pav)
  }

  test("classifier agrees with its rule teacher on >90% of docs and both classes") {
    val out = TextDedupQueries.textQualityClf(spark, sf("sf0.001")).cache()
    val n = out.count()
    val agree = out.where(col("pred_keep") === col("rule_keep")).count()
    assert(agree.toDouble / n > 0.9, s"agreement $agree/$n")
    // the learned cut must actually fire in both directions: some docs
    // predicted drop, and among rule-dropped docs a majority predicted drop
    val dropDocs = out.where(col("rule_keep") === 0)
    val dropCaught = dropDocs.where(col("pred_keep") === 0).count()
    assert(dropDocs.count() > 0)
    assert(dropCaught.toDouble / dropDocs.count() > 0.5,
      s"rule-drop recall $dropCaught/${dropDocs.count()}")
    out.unpersist()
  }
}
