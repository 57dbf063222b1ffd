package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binning range join: result-equal to the theta join it replaces, planned
  * as an equi-join (no nested-loop), correct on bin edges and overlaps. */
class RangeJoinSpec extends SparkSpec {

  private def points = {
    import spark.implicits._
    Seq(0.0, 4.9, 5.0, 11.99, 12.0, 17.0, 23.9, 24.0, 55.5, -3.0, 112.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
  }

  private def ranges = {
    import spark.implicits._
    // overlapping bands incl. one fully inside a bin and one spanning many
    Seq((0L, 0.0, 12.0), (1L, 5.0, 17.0), (2L, 10.0, 24.0), (3L, 2.0, 3.0),
      (4L, 0.0, 100.0)).toDF("rid", "lo", "hi")
  }

  test("matches the theta join exactly, including overlaps and edges") {
    val got = RangeJoin.pointInRange(points, col("v"), ranges,
        col("lo"), col("hi"), binWidth = 12.0)
      .select(col("pid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = points.join(ranges, col("v") >= col("lo") && col("v") < col("hi"))
      .select(col("pid"), col("rid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty && got == want)
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    val p = RangeJoin.pointInRange(points, col("v"), ranges,
        col("lo"), col("hi"), binWidth = 12.0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must rewrite to an equi-join:\n$p")
  }

  test("keeps a point just under an hi that sits just past a bin edge") {
    import spark.implicits._
    // hi = 5.0000000005 crosses the w=1 bin edge at 5 by less than the old
    // 1e-9 trim; p = 5.0000000001 lives in bin 5, which the trimmed
    // replication never produced — the match was silently dropped.
    val r = Seq((0L, 1.0, 5.0000000005)).toDF("rid", "lo", "hi")
    val p = Seq((0L, 5.0000000001)).toDF("pid", "v")
    assert(RangeJoin.pointInRange(p, col("v"), r, col("lo"), col("hi"), 1.0).count() == 1)
    // and an hi exactly on an edge still matches nothing in its dead bin
    val r2 = Seq((0L, 1.0, 5.0)).toDF("rid", "lo", "hi")
    val p2 = Seq((0L, 5.0)).toDF("pid", "v")
    assert(RangeJoin.pointInRange(p2, col("v"), r2, col("lo"), col("hi"), 1.0).count() == 0)
  }

  test("replication stays linear in span/width; matches stay exact") {
    import spark.implicits._
    val one = Seq((0L, 0.0, 100.0)).toDF("rid", "lo", "hi")
    val n = RangeJoin.pointInRange(
      Seq((0L, 50.0)).toDF("pid", "v"), col("v"), one,
      col("lo"), col("hi"), binWidth = 10.0).count()
    // bins 0..10 inclusive → 11 replicas (the bin-10 replica is dead, hi is
    // exclusive); the point still matches exactly once
    assert(n == 1)
  }
}
