package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resample/gap-fill: dense grid bounds, zero-fill, forward-fill, last-event
  * tie-break. */
class ResampleSpec extends SparkSpec {

  test("gaps are zero-filled and state forward-fills across them") {
    import spark.implicits._
    // user a: events in buckets 0 and 3 (interval 10µs) → grid 0..3,
    // buckets 1-2 zero-filled carrying state "x"; bucket 3 flips to "y"
    val e = Seq(("a", 5L, "x"), ("a", 31L, "y")).toDF("u", "ts", "st")
    val got = Resample.resample(e, col("u"), col("ts"), col("st"), 10L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((0L, 1L, "x"), (1L, 0L, "x"), (2L, 0L, "x"), (3L, 1L, "y")))
  }

  test("within a bucket the LAST event's state wins (max ts, then max state)") {
    import spark.implicits._
    val e = Seq(("a", 1L, "x"), ("a", 9L, "z"), ("a", 9L, "y")).toDF("u", "ts", "st")
    val got = Resample.resample(e, col("u"), col("ts"), col("st"), 10L)
      .collect().map(r => (r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((3L, "z"))) // ts-9 tie resolves to max state "z"
  }

  test("negative timestamps floor-divide (bucket -1, not trunc's 0)") {
    import spark.implicits._
    // ts -5 with interval 10 belongs to bucket -1 ([-10, 0)) under floor
    // division — DuckDB's `//` and Math.floorDiv agree; a trunc-toward-zero
    // `div` would wrongly merge it into bucket 0
    val e = Seq(("a", -5L, "x"), ("a", 5L, "y")).toDF("u", "ts", "st")
    val got = Resample.resample(e, col("u"), col("ts"), col("st"), 10L)
      .orderBy("bucket")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq((-1L, 1L, "x"), (0L, 1L, "y")))
  }

  test("entities are independent: each gets its own grid bounds") {
    import spark.implicits._
    val e = Seq(("a", 0L, "x"), ("a", 25L, "x"), ("b", 100L, "q")).toDF("u", "ts", "st")
    val got = Resample.resample(e, col("u"), col("ts"), col("st"), 10L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 0L), ("a", 1L), ("a", 2L), ("b", 10L)))
  }
}
