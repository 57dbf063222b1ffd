package graft.som

import org.scalatest.funsuite.AnyFunSuite
import scala.util.hashing.MurmurHash3

class XORShiftRandomSpec extends AnyFunSuite {

  /** Independent twin of the generator: drive the raw xorshift64 recurrence
    * (21/35/4) from the murmur-avalanched seed and derive nextInt the way
    * java.util.Random.nextInt = next(32) does. */
  private def referenceStream(seed: Long, n: Int): Seq[Int] = {
    val bytes = java.nio.ByteBuffer.allocate(8).putLong(seed).array()
    val lo = MurmurHash3.bytesHash(bytes)
    val hi = MurmurHash3.bytesHash(bytes, lo)
    var s = (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
    (1 to n).map { _ =>
      s ^= s << 21; s ^= s >>> 35; s ^= s << 4
      (s & ((1L << 32) - 1)).toInt
    }
  }

  test("nextInt stream matches the raw xorshift64(21/35/4) recurrence") {
    for (seed <- Seq(0L, 1L, 42L, -7L, Long.MaxValue)) {
      val rng = new XORShiftRandom(seed)
      val got = Seq.fill(64)(rng.nextInt())
      assert(got == referenceStream(seed, 64), s"seed=$seed")
    }
  }

  test("setSeed rewinds to the same stream") {
    val rng = new XORShiftRandom(99)
    val first = Seq.fill(16)(rng.nextInt())
    rng.setSeed(99)
    assert(Seq.fill(16)(rng.nextInt()) == first)
  }

  test("derived draws are deterministic per seed and in-range") {
    val a = new XORShiftRandom(7)
    val b = new XORShiftRandom(7)
    val da = Seq.fill(100)(a.nextDouble())
    val db = Seq.fill(100)(b.nextDouble())
    assert(da == db)
    assert(da.forall(x => x >= 0.0 && x < 1.0))
    assert(new XORShiftRandom(7).nextInt() != new XORShiftRandom(8).nextInt())
  }
}
