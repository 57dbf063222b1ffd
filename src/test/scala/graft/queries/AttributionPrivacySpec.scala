package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the round-13 analytics entries, proven against independent
  * in-test recomputations (the two-algorithms-one-answer discipline the
  * oracle gate applies at sf0.01 — here at sf0.001 with a THIRD spelling).
  */
class AttributionPrivacySpec extends SparkSpec {

  test("attribution: RANGE-frame result equals the naive purchase×touch join") {
    val dir = sf("sf0.001")
    val got = EventQueries.attribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

    // naive recompute: interval join, then per-purchase driver-side fold
    // (sf0.001 is small enough to collect)
    // EventTs gives the same exact epoch-micros integers the entry uses
    // (only RELATIVE times matter to attribution, so the zone is moot)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val e = raw.select(col("event_id"), col("user_id"),
        EventTs.tsUs(raw).as("us"), col("event_type"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      .collect()
    case class Ev(id: Long, user: Long, us: Long, typ: String, cents: Long)
    val evs = e.map(r => Ev(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4)))
    val week = 7L * 86400L * 1000000L
    val zero = Map("view" -> 0L, "click" -> 0L, "direct" -> 0L)
    var first = zero; var last = zero; var linear = zero
    for (p <- evs if p.typ == "purchase") {
      val touches = evs.filter(t => (t.typ == "view" || t.typ == "click") &&
        t.user == p.user && t.us < p.us && t.us >= p.us - week)
        .sortBy(t => (t.us, t.id))
      if (touches.isEmpty) {
        first += "direct" -> (first("direct") + p.cents)
        last += "direct" -> (last("direct") + p.cents)
        linear += "direct" -> (linear("direct") + p.cents)
      } else {
        val n = touches.length
        val per = p.cents / n
        val rem = p.cents - per * n
        first += touches.head.typ -> (first(touches.head.typ) + p.cents)
        last += touches.last.typ -> (last(touches.last.typ) + p.cents)
        touches.foreach(t => linear += t.typ -> (linear(t.typ) + per))
        linear += touches.last.typ -> (linear(touches.last.typ) + rem)
      }
    }
    val chans = got.keySet
    assert(chans.subsetOf(Set("view", "click", "direct")))
    for (c <- chans) {
      assert(got(c)._1 == first(c), s"first[$c]")
      assert(got(c)._2 == last(c), s"last[$c]")
      assert(got(c)._3 == linear(c), s"linear[$c]")
    }
    // every model conserves total purchase cents across channels
    val total = evs.filter(_.typ == "purchase").map(_.cents).sum
    assert(got.values.map(_._1).sum == total)
    assert(got.values.map(_._2).sum == total)
    assert(got.values.map(_._3).sum == total)
  }

  test("bitmap retention equals the count-distinct spelling row for row") {
    val dir = sf("sf0.001")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(toMap(EventQueries.retentionBitmap(spark, dir)) ==
      toMap(EventQueries.retention(spark, dir)))
  }

  test("tree stump: the reported split is the exact-integer Gini argmin (brute recompute)") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlTreeStump(spark, dir).head()
    // third spelling: collect the histogram, fold driver-side
    val h = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("int").as("qty"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      .groupBy("qty").agg(count(lit(1)).as("n"), sum("y").as("pos"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nn = h.map(_._2).sum; val pp = h.map(_._3).sum
    var nl = 0L; var posl = 0L
    val costs = h.init.map { case (qty, n, pos) =>
      nl += n; posl += pos
      val nr = nn - nl; val posr = pp - posl
      def c(n: Long, p: Long) = (10000L * (n * n - p * p - (n - p) * (n - p))) / n
      (c(nl, posl) + c(nr, posr), qty, nl, posl, nr, posr)
    }
    val best = costs.minBy(t => (t._1, t._2))
    assert(got.getInt(0) == best._2 && got.getLong(1) == best._1)
    assert(got.getLong(2) == best._3 && got.getLong(3) == best._4)
    assert(got.getLong(4) == best._5 && got.getLong(5) == best._6)
    // the stump must beat the majority-vote baseline on training accuracy
    val acc = got.getLong(6)
    val baseline = (1000000L * math.max(pp, nn - pp)) / nn
    assert(acc >= baseline, s"acc_ppm=$acc baseline=$baseline")
  }

  test("chi2 selection: milli rendering within 1 of the float statistic; term floors exact") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlChi2Select(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == Set("qty", "disc"))

    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("int").as("qty"),
        expr("cast(cast(l_discount as decimal(18,2)) * 100 as int)").as("disc"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val nn = rows.length.toLong; val pp = rows.map(_._3).sum
    for ((feat, pick) <- Seq("qty" -> ((t: (Int, Int, Long)) => t._1),
                             "disc" -> ((t: (Int, Int, Long)) => t._2))) {
      val byV = rows.groupBy(pick).map { case (v, g) =>
        (v, g.length.toLong, g.map(_._3).sum) }.toSeq
      // exact BigInt replay of the entry's spelling
      val s = byV.map { case (_, n, pos) =>
        val d = BigInt(pos * nn - n * pp); (d * d) / n }.sum
      val milli = (BigInt(1000) * s / (BigInt(pp) * (nn - pp))).toLong
      val (nVals, dof, gotMilli) = got(feat)
      assert(nVals == byV.size.toLong && dof == nVals - 1)
      assert(gotMilli == milli, s"$feat exact")
      // and the e0 term floors track the true float chi2 within rounding:
      // each of the <=50 floors loses <1, so milli-chi2 sits within
      // 1000*K/(P(N-P)) + 1 of 1000*chi2 — negligible; assert the loose bond
      val floatChi2 = byV.map { case (_, n, pos) =>
        val d = pos.toDouble * nn - n.toDouble * pp
        d * d / (n.toDouble * pp * (nn - pp))
      }.sum
      assert(math.abs(gotMilli - 1000.0 * floatChi2) <= 1.0 + 1e-6 * floatChi2 * 1000,
        s"$feat float cross-check: $gotMilli vs ${1000 * floatChi2}")
    }
    // quantity must out-rank discount on this label (price ~ qty by
    // construction; discount is independent)
    assert(got("qty")._3 > got("disc")._3)
  }

  test("dp counts: noise equals the driver-side geometric inverse CDF; planted-truth error audit") {
    val dir = sf("sf0.001")
    val got = RelationalQueries.qPrivDpCounts(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)

    // independent spelling of the same distribution: cumulative pmf sum
    // in exact BigInt (pmf(j)·3·2⁶⁰ = 2^(60−|j|); the below−(−60) tail
    // mass of 1 is clamped into k=−60, matching the entry's band table)
    def noiseOf(nation: Int): Int = {
      val h = graft.functions.HashKernels.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"dp:$nation"))
      val t = BigInt(3) * BigInt(h)
      var cum = BigInt(1)
      (-60 to 60).find { k =>
        cum += BigInt(1) << (60 - math.abs(k)); t < cum
      }.getOrElse(60)
    }
    got.foreach { case (nation, trueN, noise, released) =>
      assert(noise == noiseOf(nation), s"nation $nation noise")
      assert(released == trueN + noise, s"nation $nation release")
    }
    // the true counts replay from the raw table (the planted truth)
    val truth = spark.read.parquet(s"$dir/customer.parquet")
      .groupBy(col("c_nationkey").cast("int")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.foreach { case (nation, trueN, _, _) => assert(truth(nation) == trueN) }
    // distribution sanity: two-sided geometric at alpha=1/2 has E|K| = 4/3
    // and P(|K| > 20) < 1e-6 — the audit that the utility is as designed
    assert(got.forall(t => math.abs(t._3) <= 20))
    val meanAbs = got.map(t => math.abs(t._3)).sum.toDouble / got.length
    assert(meanAbs <= 4.0, s"mean |noise| $meanAbs is far off E|K|=4/3")
    // noise depends ONLY on the group key, never the data: noiseOf above
    // is a pure function of the nation id (its input is the md5 coin of
    // "dp:<nation>", no count anywhere), and every released noise equals
    // it — a regression that seeded the coin with true_n would break the
    // per-nation equality asserted in the first loop
  }

  test("depth-2 tree: root and both per-side argmins equal a brute driver-side search") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlTreeDepth2(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("L", "R"))

    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("int").as("qty"),
        expr("cast(cast(l_discount as decimal(18,2)) * 100 as int)").as("disc"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

    def gini(n: Long, p: Long) = (10000L * (n * n - p * p - (n - p) * (n - p))) / n
    // brute best split of (value, y) pairs: (cost, value, nl, posl, ns, ps)
    def best(vy: Seq[(Int, Long)]): Option[(Long, Int, Long, Long, Long, Long)] = {
      val ns = vy.size.toLong; val ps = vy.map(_._2).sum
      val values = vy.map(_._1).distinct.sorted
      val cands = values.init.map { v =>
        val l = vy.filter(_._1 <= v)
        val nl = l.size.toLong; val posl = l.map(_._2).sum
        (gini(nl, posl) + gini(ns - nl, ps - posl), v, nl, posl, ns, ps)
      }
      if (cands.isEmpty) None else Some(cands.minBy(t => (t._1, t._2)))
    }
    // root = the stump argmin on qty over everything
    val rootBest = best(rows.map(r => (r._1, r._3))).get
    val rootQty = rootBest._2
    assert(got("L").getAs[Int]("root_qty") == rootQty)

    // per side: the better of the two features' brute argmins, feature
    // name breaking cost ties ('disc' < 'qty' lexicographically)
    for (side <- Seq("L", "R")) {
      val sideRows = rows.filter(r => (r._1 <= rootQty) == (side == "L"))
      val byFeat = Seq("disc" -> sideRows.map(r => (r._2, r._3)),
        "qty" -> sideRows.map(r => (r._1, r._3)))
        .flatMap { case (f, vy) => best(vy).map(b => (b._1, f, b)) }
      val (cost, feat, b) = byFeat.minBy(t => (t._1, t._2, t._3._2))
      val row = got(side)
      assert(row.getAs[String]("feature") == feat, s"$side feature")
      assert(row.getAs[Int]("split_val") == b._2, s"$side split")
      assert(row.getAs[Long]("cost_e4") == cost, s"$side cost")
      assert(row.getAs[Long]("n_side") == b._5 && row.getAs[Long]("pos_side") == b._6)
      assert(row.getAs[Long]("n_left") == b._3 && row.getAs[Long]("pos_left") == b._4)
    }

    // the depth-2 tree's training accuracy dominates the stump's (a second
    // level can only refine the leaves), and both rows agree on it
    val stumpAcc = MlQueries.mlTreeStump(spark, dir).head().getLong(6)
    val treeAcc = got("L").getAs[Long]("tree_acc_ppm")
    assert(treeAcc == got("R").getAs[Long]("tree_acc_ppm"))
    assert(treeAcc >= stumpAcc, s"tree $treeAcc vs stump $stumpAcc")
  }

  test("isotonic calibration: minimax spelling equals driver-side PAV; output monotone") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlIsotonic(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // monotone nondecreasing in the feature
    assert(got.sliding(2).forall {
      case Array(a, b) => a._4 <= b._4; case _ => true })
    // pool-adjacent-violators on the same histogram, exact integer pools
    case class Pool(n: Long, pos: Long)
    val pools = scala.collection.mutable.ArrayBuffer[Pool]()
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    for ((_, n, pos, _) <- got) {
      pools += Pool(n, pos); sizes += 1
      // merge while the mean would DECREASE: pos/n comparison by
      // cross-multiplication, exact
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
    assert(got.map(_._4).toSeq == pav)
  }

  test("streaming bitmap DAU drains to exactly the batch distinct count") {
    val dir = sf("sf0.001")
    val got = EventQueries.dauStreamBitmap(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val expect = raw.select(
        date_format(timestamp_micros(EventTs.tsUs(raw)), "yyyy-MM-dd").as("day"),
        col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("KS statistic: cross-multiplied sup equals a driver-side CDF recompute") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlKsTest(spark, dir).head()
    val xs = spark.read.parquet(s"$dir/events.parquet")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = xs.filter(_._1 == "purchase").map(_._2).sorted
    val b = xs.filter(_._1 == "click").map(_._2).sorted
    val support = (a ++ b).distinct.sorted
    val dNum = support.map { v =>
      val c1 = a.count(_ <= v).toLong; val c2 = b.count(_ <= v).toLong
      math.abs(c1 * b.length - c2 * a.length)
    }.max
    assert(got.getLong(0) == a.length && got.getLong(1) == b.length)
    assert(got.getLong(2) == dNum)
    assert(got.getLong(3) == (1000000L * dNum) / (a.length.toLong * b.length))
  }

  test("AUC: doubled-unit U equals the brute concordant/tied pair count") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlAuc(spark, dir).head()
    val h = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("int").as("qty"),
        (col("l_extendedprice") > 30000).cast("long").as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val pos = h.filter(_._2 == 1L).map(_._1)
    val neg = h.filter(_._2 == 0L).map(_._1)
    // brute force over all pos×neg pairs: 2 per concordant, 1 per tie
    val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(got.getLong(2) == u2)
    assert(got.getLong(3) ==
      (500000L * u2) / (pos.length.toLong * neg.length))
    // the synthetic columns are independent, so the AUC must sit at the
    // 0.5 null — the honest negative control (ml_ab_test's discipline)
    assert(got.getLong(3) > 450000L && got.getLong(3) < 550000L)
  }

  test("streaming attribution drains to exactly the batch RANGE-frame result") {
    val dir = sf("sf0.001")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(toMap(EventQueries.attributionStreamed(spark, dir)) ==
      toMap(EventQueries.attribution(spark, dir)))
  }

  test("bootstrap CI: ordered, centered, and replicate-exact") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlBootstrapCi(spark, dir).head()
    val (n, mean, lo, hi) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert(n > 0 && lo <= hi)
    // a 90% CI for a mean over hundreds of purchases sits tight around it
    assert(lo <= mean && mean <= hi, s"mean $mean outside [$lo, $hi]")
    assert(hi - lo < mean, "CI wider than the mean itself — weights broken")
    // replicate means are deterministic: a second run is bit-identical
    val again = MlQueries.mlBootstrapCi(spark, dir).head()
    assert((again.getLong(2), again.getLong(3)) == (lo, hi))
  }

  test("randomization test: identities, determinism, and the expected null at small n") {
    val dir = sf("sf0.001")
    val got = MlQueries.mlPermTest(spark, dir).head()
    val (obs, nGe, b, pPct) =
      (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
    assert(obs >= 0 && b == 32 && nGe >= 0 && nGe <= b)
    assert(pPct == (100 * nGe) / b)
    // ~200 rows/arm: the synthetic arms share a distribution, so the
    // observed gap must NOT be extreme under relabeling (the honest null
    // ml_ab_test's z-test also reports)
    assert(nGe > 0, "a shared-distribution corpus must not yield p=0 at n~200")
    val again = MlQueries.mlPermTest(spark, dir).head()
    assert(again.getLong(1) == nGe)
  }

  test("t-closeness: integer TV identities hold and a uniform corpus passes t=1/2") {
    val r = RelationalQueries.qPrivTCloseness(spark, sf("sf0.001")).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val (n_g, tvNum, denHalf, tOk) =
        (row.getLong(2), row.getLong(3), row.getLong(4), row.getInt(5))
      // TV ∈ [0, 1]: 0 ≤ tv_num ≤ 2·n_g·N
      assert(tvNum >= 0 && tvNum <= 2 * denHalf)
      assert((tOk == 1) == (tvNum <= denHalf))
      assert(n_g > 0)
    }
  }

  test("randomized response: estimator identity and bounds per nation") {
    val r = RelationalQueries.qPrivRandResponse(spark, sf("sf0.001")).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val (n, trueN, obs, estHalf) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(obs >= 0 && obs <= n)
      assert(trueN >= 0 && trueN <= n)
      assert(estHalf == 4 * obs - n) // the exact half-unit identity
    }
    // the corpus-level estimate lands near the true count (p=3/4 coin on a
    // deterministic hash: sf0.001 has ~1500 customers, so the half-unit
    // estimate is within ~20% of truth with huge margin)
    val n = r.map(_.getLong(1)).sum
    val trueN = r.map(_.getLong(2)).sum
    val est = r.map(_.getLong(4)).sum / 2.0
    assert(math.abs(est - trueN) < 0.2 * n, s"est=$est true=$trueN n=$n")
  }
}
