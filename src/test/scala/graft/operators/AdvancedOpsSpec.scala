package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AdvancedOpsSpec extends SparkSpec {

  test("asOfLast picks the latest at-or-before payload per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "t", "id")
    val right = Seq((1L, 40L, "a"), (1L, 100L, "b"), (1L, 101L, "c"), (3L, 1L, "z"))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOfLast(left, right, "k", "t", "v", "asof_v")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("asof_v")).toMap
    assert(out("p1") == "b")   // right row at the same t counts (at-or-before)
    assert(out("p2") == "a")
    assert(out("p3") == null)  // no right row for key 2 at or before t=10
  }

  test("asOfLast result matches a naive per-row scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val left = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }.toDF("k", "t", "id")
    val right = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(100).toLong))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOfLast(left, right, "k", "t", "v", "asof_v")
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val rrows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    left.collect().foreach { lr =>
      val (k, t, id) = (lr.getLong(0), lr.getLong(1), lr.getLong(2))
      val cands = rrows.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) assert(got(id).isEmpty)
      else {
        val maxT = cands.map(_._2).max
        val expected = cands.filter(_._2 == maxT).map(_._3)
        assert(expected.contains(got(id).get))
      }
    }
  }

  test("salted sum aggregation equals plain groupBy exactly on integer data") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i % 7, (i % 13).toLong)).toDF("k", "x")
    val salted = Salting.saltedSumAgg(df, "k", pmod(col("x"), lit(4)),
      Seq(col("x") -> "sx"), countName = Some("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val plain = df.groupBy("k").agg(sum("x").as("sx"), count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("salted join returns exactly the plain join rows") {
    import spark.implicits._
    val big = (0 until 1000).map(i => (i % 10, i.toLong)).toDF("k", "payload")
    val small = (0 until 10).map(i => (i, s"dim$i")).toDF("k", "name")
    val salted = Salting.saltedJoin(big, small, "k", 4, col("payload"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    val plain = big.join(small, "k")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
  }

  test("approx_count_distinct lands within 5% of exact") {
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val approx = li.agg(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    val exact = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("KMV distinct estimate stays inside the k=64 error envelope per group") {
    // std-err at k=64 is 1/sqrt(62) ~ 12.7%; gate at 4 sigma. Also assert
    // the estimator branch is actually exercised (>= k distinct hashes in
    // at least one group) — exact-count passthrough alone proves nothing.
    val dir = sf("sf0.1")
    val est = graft.queries.AdvancedQueries.qApproxDistinctKmv(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    assert(exact.values.exists(_ >= graft.queries.AdvancedQueries.KmvK),
      "no group reached k distinct keys — estimator branch never ran")
    for ((flag, nd) <- exact) {
      val e = est(flag)
      if (nd < graft.queries.AdvancedQueries.KmvK)
        assert(e == nd, s"small-set exactness violated for $flag: $e != $nd")
      else
        assert(math.abs(e - nd).toDouble / nd < 4.0 / math.sqrt(62.0),
          s"KMV estimate for $flag off: est=$e exact=$nd")
    }
  }

  test("bloom membership: no member ever misses; FP branch exercised; rate bounded") {
    // replicate the entry's construction at key level to prove CONTAINMENT
    // (hits ⊇ members — the defining one-sided guarantee the summary counts
    // alone can't distinguish from a miss+FP coincidence), then cross-check
    // the summary equals the entry's output
    val dir = sf("sf0.1")
    val adv = graft.queries.AdvancedQueries
    val urgent = spark.read.parquet(dir + "/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("key")).distinct()
    val nKeys = urgent.count()
    val m = 1L << (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nKeys - 1)) + 4)
    def positions(key: org.apache.spark.sql.Column) =
      array((0 until adv.BloomD).map { i =>
        pmod(graft.functions.VectorSql.md5Hash60(
          concat(lit(s"$i:"), key.cast("string"))), lit(m))
      }: _*)
    val bits = urgent.select(explode(positions(col("key"))).as("pos")).distinct()
    val probes = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey").as("key")).distinct()
    val hitKeys = probes.select(col("key"), explode(positions(col("key"))).as("pos"))
      .join(bits, Seq("pos"), "left_semi")
      .groupBy(col("key")).count().where(col("count") === adv.BloomD)
      .select(col("key")).collect().map(_.getLong(0)).toSet
    val memberKeys = probes.join(urgent, Seq("key"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(memberKeys.subsetOf(hitKeys),
      s"one-sided guarantee broken: ${(memberKeys -- hitKeys).take(3)} missed")
    val fp = hitKeys -- memberKeys
    assert(fp.nonEmpty, "no false positives at sf0.1 — the FP branch is untested")
    val rate = fp.size.toDouble / (probes.count() - memberKeys.size)
    assert(rate < 0.05, s"fp rate $rate — corpus-adaptive sizing failed")
    // and the catalog entry reports exactly these counts
    val row = adv.qBloomMembership(spark, dir).head()
    assert(row.getLong(1) == memberKeys.size && row.getLong(2) == hitKeys.size,
      "entry summary disagrees with the key-level construction")
  }

  test("count-min estimates never underestimate and stay inside the d*N/w envelope") {
    // CMS one-sided error: est >= exact ALWAYS (min over d counters each of
    // which includes every occurrence of the key) — swept over EVERY key via
    // a distributed violation join, not just the reported top-10;
    // overestimate bounded in expectation by N/w per row — gate the
    // reported heavy hitters at 8*N/w.
    val dir = sf("sf0.1")
    val adv = graft.queries.AdvancedQueries
    val li = spark.read.parquet(dir + "/lineitem.parquet")
    val n = li.count()
    val exactDf = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("exact"))
    val underCount = adv.cmsEstimates(spark, dir)
      .join(exactDf, "l_partkey")
      .where(col("est_freq") < col("exact")).count()
    assert(underCount == 0L,
      s"CMS underestimated $underCount keys — one-sided guarantee broken")
    val rep = adv.qTopkFreqCms(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val exact = exactDf
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rep.size == adv.CmsTopK)
    for ((key, est) <- rep) {
      val ex = exact(key)
      assert(est - ex <= 8L * n / adv.CmsW,
        s"CMS overestimate for $key out of envelope: est=$est exact=$ex n=$n")
    }
  }

  test("CMS merge: three disjoint-shard partials summed equal the monolithic matrix") {
    // counters add, so merged == whole MUST hold cell for cell (not merely
    // the top-10 surviving) — the property that makes per-slice sketches
    // composable at all; asserted by symmetric-difference join on (r, c).
    val dir = sf("sf0.01")
    val adv = graft.queries.AdvancedQueries
    val whole = adv.cmsSketch(spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_partkey")))
    val merged = adv.cmsMergedSketch(spark, dir)
    val diff = whole.withColumnRenamed("cnt", "a")
      .join(merged.withColumnRenamed("cnt", "b"), Seq("r", "c"), "full")
      .where(col("a").isNull || col("b").isNull || col("a") =!= col("b"))
      .count()
    assert(diff == 0L, s"merged CMS differs from monolithic in $diff cells")
  }

  test("bloom-fill cardinality estimate lands within 2% of exact") {
    // at >=16 bits/key the filter is sparse (fill <= ~17%), where the
    // Swamidass-Baldi estimator's relative error is well under a percent in
    // expectation — 2% is a loose deterministic gate on the real corpora.
    for (d <- Seq("sf0.001", "sf0.01")) {
      val r = graft.queries.AdvancedQueries.qBloomCardinality(spark, sf(d)).head()
      val (m, x, exact, est) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(x < m / 4, s"$d: filter unexpectedly dense: $x/$m")
      assert(math.abs(est - exact) <= 0.02 * exact,
        s"$d: bloom-fill estimate $est vs exact $exact out of 2% envelope")
    }
  }

  test("KMV set-algebra estimates land inside the theta-sketch envelope") {
    // union estimate: plain KMV on the union sketch — 4 sigma at k=64.
    // intersection: a theta-rate sample of the overlap — same order; exact
    // values computed by real distinct-set algebra per flag pair.
    val dir = sf("sf0.1")
    val est = graft.queries.AdvancedQueries.qKmvSetOps(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val sets = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(est.nonEmpty)
    val tol = 4.0 / math.sqrt(62.0)
    for (((fa, fb), (uEst, iEst)) <- est) {
      val (a, b) = (sets(fa), sets(fb))
      val (u, i) = ((a ++ b).size, (a & b).size)
      assert(math.abs(uEst - u).toDouble / u < tol, s"($fa,$fb) union est=$uEst exact=$u")
      assert(math.abs(iEst - i).toDouble / math.max(i, 1) < tol,
        s"($fa,$fb) inter est=$iEst exact=$i")
    }
  }

  test("hash-sampled quantile lands inside the exact p40-p60 / p85-p95 bands") {
    // a 1/4 deterministic sample at sf0.1 leaves m ~ 50k rows per flag;
    // rank error ~ sqrt(p(1-p)/m) < 0.3% of rank — the bands are generous
    val dir = sf("sf0.1")
    val est = graft.queries.AdvancedQueries.qApproxQuantileHash(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = spark.read.parquet(dir + "/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.40, 0.60, 0.85, 0.95))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(est.keySet == exact.keySet)
    for ((flag, (p50, p90)) <- est) {
      val Seq(q40, q60, q85, q95) = exact(flag).toSeq
      assert(p50 >= q40 && p50 <= q60, s"$flag sampled p50=$p50 outside [$q40,$q60]")
      assert(p90 >= q85 && p90 <= q95, s"$flag sampled p90=$p90 outside [$q85,$q95]")
    }
  }

  test("approx_percentile stays inside the 1/accuracy rank-error envelope") {
    // accuracy 1000 guarantees rank error ≤ n/1000: the sketch's p50 must
    // sit between the EXACT p49.8 and p50.2 values (and same at p90).
    val li = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
    val Seq(a50, a90) = Seq(0.5, 0.9).map(p =>
      li.agg(percentile_approx(col("l_extendedprice"), lit(p), lit(1000)))
        .head().getDouble(0))
    def exact(p: Double) =
      li.agg(expr(s"percentile(l_extendedprice, $p)")).head().getDouble(0)
    assert(a50 >= exact(0.498) && a50 <= exact(0.502), s"p50=$a50")
    assert(a90 >= exact(0.898) && a90 <= exact(0.902), s"p90=$a90")
  }
}
