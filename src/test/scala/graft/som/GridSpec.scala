package graft.som

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class GridSpec extends AnyFunSuite {

  test("cellDist is Manhattan distance on the grid") {
    // 3-wide grid: cell 0=(0,0), 5=(1,2), 7=(2,1)
    assert(Grid.cellDist(3)(0, 0) == 0.0)
    assert(Grid.cellDist(3)(0, 5) == 3.0)
    assert(Grid.cellDist(3)(5, 7) == 2.0)
    assert(Grid.cellDist(3)(0, 8) == 4.0)
  }

  test("cellDist is symmetric and satisfies triangle inequality") {
    val rnd = new Random(0)
    val d = Grid.cellDist(5) _
    for (_ <- 0 until 500) {
      val (a, b, c) = (rnd.nextInt(25), rnd.nextInt(25), rnd.nextInt(25))
      assert(d(a, b) == d(b, a))
      assert(d(a, c) <= d(a, b) + d(b, c))
    }
  }

  test("temperature hits tMax at iter 0 and tMin at last iter, both decays") {
    for (decay <- Seq("exponential", "linear")) {
      assert(math.abs(Grid.temperature(decay, 0, 20, 10.0, 1.0) - 10.0) < 1e-12)
      assert(math.abs(Grid.temperature(decay, 19, 20, 10.0, 1.0) - 1.0) < 1e-12)
    }
  }

  test("temperature is monotone decreasing") {
    for (decay <- Seq("exponential", "linear"); i <- 1 until 20)
      assert(Grid.temperature(decay, i, 20, 10.0, 1.0) <
        Grid.temperature(decay, i - 1, 20, 10.0, 1.0))
  }

  test("maxIter<=1 pins temperature to tMin (reference NaN edge, SURVEY §7.3.1)") {
    assert(Grid.temperature("exponential", 0, 1, 10.0, 1.0) == 1.0)
    assert(Grid.temperature("linear", 0, 1, 10.0, 1.0) == 1.0)
  }

  test("gaussian kernel: 1 at d=0, decreasing, never zero") {
    assert(Grid.kernelWeight("gaussian", 0.0, 2.0) == 1.0)
    assert(Grid.kernelWeight("gaussian", 1.0, 2.0) > Grid.kernelWeight("gaussian", 2.0, 2.0))
    assert(Grid.kernelWeight("gaussian", 50.0, 2.0) >= 0.0)
  }

  test("rectangular kernel: step at d=T inclusive") {
    assert(Grid.kernelWeight("rectangular", 2.0, 2.0) == 1.0)
    assert(Grid.kernelWeight("rectangular", 2.0001, 2.0) == 0.0)
  }
}
