package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Hilbert curve's defining properties, plus identity between the
  * driver-side walk, interpreted eval, and the codegen'd expression. */
class HilbertSpec extends SparkSpec {

  test("xy2d is a bijection onto [0, 4^bits)") {
    for (bits <- 1 to 4) {
      val side = 1 << bits
      val ds = for { x <- 0 until side; y <- 0 until side }
        yield Hilbert.xy2d(bits, x, y)
      assert(ds.sorted == (0 until side * side).toList)
    }
  }

  test("consecutive Hilbert ids are spatially adjacent (Morton's are not)") {
    val bits = 3; val side = 1 << bits
    val cellOf = (for { x <- 0 until side; y <- 0 until side }
      yield Hilbert.xy2d(bits, x, y) -> (x, y)).toMap
    for (d <- 0 until side * side - 1) {
      val (x1, y1) = cellOf(d); val (x2, y2) = cellOf(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between d=$d and ${d + 1}")
    }
    // the contrast: Morton has at least one non-adjacent consecutive pair
    val mortonCell = (for { x <- 0 until side; y <- 0 until side }
      yield graft.sources.Sources.mortonBucket(x, y, bits) -> (x, y)).toMap
    assert((0 until side * side - 1).exists { d =>
      val (x1, y1) = mortonCell(d); val (x2, y2) = mortonCell(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    })
  }

  test("a 2-D box decomposes into no more runs than Morton — fewer for the entry's shape") {
    val bits = 3
    def mortonRuns(loX: Int, hiX: Int, loY: Int, hiY: Int): Int = {
      val ds = (for { x <- loX to hiX; y <- loY to hiY }
        yield graft.sources.Sources.mortonBucket(x, y, bits)).sorted
      1 + ds.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }
    }
    var strictlyFewer = 0
    for (lo <- 0 until 6; hi <- (lo + 2) until 8) {
      val h = Hilbert.boxRuns(bits, lo, hi, lo, hi).size
      val m = mortonRuns(lo, hi, lo, hi)
      assert(h <= m, s"box [$lo,$hi]²: hilbert $h runs vs morton $m")
      if (h < m) strictlyFewer += 1
    }
    assert(strictlyFewer > 0) // the advantage is real, not just a tie
  }

  test("boxRuns covers exactly the box's cells, as sorted disjoint runs") {
    val bits = 3
    val runs = Hilbert.boxRuns(bits, 2, 5, 1, 6)
    val expanded = runs.flatMap { case (lo, hi) => lo to hi }
    val expect = (for { x <- 2 to 5; y <- 1 to 6 }
      yield Hilbert.xy2d(bits, x, y)).sorted
    assert(expanded == expect)
    assert(runs.sliding(2).forall {
      case Seq((_, h1), (l2, _)) => l2 > h1 + 1; case _ => true })
  }

  test("codegen expression equals the driver-side walk on every cell") {
    import spark.implicits._
    val bits = 3; val side = 1 << bits
    val cells = for { x <- 0 until side; y <- 0 until side } yield (x, y)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.index(col("x"), col("y"), bits).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    for ((x, y) <- cells) assert(got((x, y)) == Hilbert.xy2d(bits, x, y))
  }
}
