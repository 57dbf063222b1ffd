package graft.som

import org.scalatest.funsuite.AnyFunSuite
import scala.util.hashing.MurmurHash3

class XORShiftRandomSpec extends AnyFunSuite {

  /** Independent twin of the generator: drive the raw xorshift64 recurrence
    * (21/35/4) from the murmur-avalanched seed and derive nextInt the way
    * java.util.Random.nextInt = next(32) does. Allocates `Long.SIZE` (64)
    * bytes for the seed buffer — the reference's quirk (its seed sits in the
    * first 8 bytes of a 64-byte zero-padded buffer), which parity must
    * reproduce. */
  private def referenceStream(seed: Long, n: Int): Seq[Int] = {
    val bytes = java.nio.ByteBuffer.allocate(java.lang.Long.SIZE).putLong(seed).array()
    val lo = MurmurHash3.bytesHash(bytes)
    val hi = MurmurHash3.bytesHash(bytes, lo)
    var s = (hi.toLong << 32) | (lo.toLong & 0xFFFFFFFFL)
    (1 to n).map { _ =>
      s ^= s << 21; s ^= s >>> 35; s ^= s << 4
      (s & ((1L << 32) - 1)).toInt
    }
  }

  /** Hardcoded first draws per seed, computed once from the reference
    * algorithm (64-byte buffer). Guards against the twin and the
    * implementation sharing a bug — a regression in either the buffer size
    * or the shift triple fails here even if both sides drift together. */
  private val golden: Map[Long, Seq[Int]] = Map(
    0L -> Seq(-278860881, -879485061, -1449226292, 2003281381, -698792014, 931434467),
    1L -> Seq(-796323371, -1779768821, 1113319699, -931563985, 1812972812, 620882506),
    42L -> Seq(1655315539, -1976142244, -814814679, 492883031, 128446121, 2143906857),
    -7L -> Seq(1303337645, -812048552, 1591291751, -968062220, -1390362080, -930381226),
    Long.MaxValue -> Seq(314109005, 1378693560, -533896468, -1427176713, -678191539, 1383550946))

  test("nextInt stream matches the raw xorshift64(21/35/4) recurrence") {
    for (seed <- Seq(0L, 1L, 42L, -7L, Long.MaxValue)) {
      val rng = new XORShiftRandom(seed)
      val got = Seq.fill(64)(rng.nextInt())
      assert(got == referenceStream(seed, 64), s"seed=$seed")
      assert(got.take(6) == golden(seed), s"golden mismatch seed=$seed")
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
