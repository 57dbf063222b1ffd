package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[MlQueries.mlGbm]]: every round's split is the exact SSE-gain argmax
  * (brute BigInt recompute of the whole three-round fit driver-side), the
  * cell-model updates replay, and the ensemble's training accuracy is at
  * least the single stump's — the reason boosting exists. */
class MlGbmSpec extends SparkSpec {

  test("3-round L2Boost: splits, leaves, gains and accuracies equal a driver-side BigInt replay") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlGbm(spark, dir).collect()
      .map(r => (r.getInt(0), (r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set(1, 2, 3))

    // third spelling: the joint histogram driver-side, rounds in BigInt
    val cells0 = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("int").as("qty"),
        expr("cast(cast(l_discount as decimal(18,2)) * 100 as int)").as("disc"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      .groupBy("qty", "disc").agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val nn = cells0.map(_._3).sum; val pp = cells0.map(_._4).sum
    var f = cells0.map(c => (c._1, c._2) -> (10000L * pp / nn)).toMap

    for (round <- 1 to 3) {
      // per (feature, v) residual sums from the current cell model
      def hist(pick: ((Int, Int)) => Int) = cells0
        .groupBy(c => pick((c._1, c._2))).map { case (v, g) =>
          (v, g.map(_._3).sum,
            g.map(c => 10000L * c._4 - c._3 * f((c._1, c._2))).sum)
        }.toSeq.sortBy(_._1)
      val cands = Seq("qty" -> hist(_._1), "disc" -> hist(_._2)).flatMap {
        case (feat, h) =>
          val ns = h.map(_._2).sum; val srs = h.map(_._3).sum
          var nl = 0L; var srl = 0L
          h.init.map { case (v, n, sr) =>
            nl += n; srl += sr
            val nr = ns - nl; val srr = srs - srl
            val gain = (BigInt(srl) * srl / nl + BigInt(srr) * srr / nr).toLong
            (gain, feat, v, srl / nl, srr / nr)
          }
      }
      // the (−gain, feature, v) total order
      val best = cands.minBy(t => (-t._1, t._2, t._3))
      val (gain, feat, v, leafL, leafR) = best
      assert(got(round) == ((feat, v, gain, leafL, leafR, got(round)._6)),
        s"round $round: got ${got(round)}, brute ($feat, $v, $gain, $leafL, $leafR)")
      f = f.map { case ((q, d), fv) =>
        val on = if (feat == "qty") q <= v else d <= v
        (q, d) -> (fv + (if (on) leafL else leafR))
      }
      val hits = cells0.map(c =>
        if (f((c._1, c._2)) >= 5000L) c._4 else c._3 - c._4).sum
      assert(got(round)._6 == 1000000L * hits / nn, s"round $round accuracy")
    }
    // boosting must not lose to the single stump on training accuracy
    val stumpAcc = MlQueries.mlTreeStump(spark, dir).head().getLong(6)
    assert(got(3)._6 >= stumpAcc,
      s"ensemble acc ${got(3)._6} < stump acc $stumpAcc")
  }

  test("residual algebra: BigInt gains never overflow the documented envelope at test scale") {
    // |Σr_side| ≤ n_side·5e4 ⇒ gain ≤ nn·(5e4)²; verify the bound holds on
    // the actual fit at sf0.001 (the envelope comment's premise)
    val dir = sf("sf0.001")
    val rows = MlQueries.mlGbm(spark, dir).collect()
    val nn = spark.read.parquet(s"$dir/lineitem.parquet").count()
    rows.foreach { r =>
      assert(r.getLong(3) <= nn * 2500000000L, "gain inside the envelope")
      assert(math.abs(r.getLong(4)) <= 50000 && math.abs(r.getLong(5)) <= 50000,
        "leaf values inside the e4 drift bound")
    }
  }
}
