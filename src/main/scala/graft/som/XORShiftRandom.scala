package graft.som

import java.nio.ByteBuffer
import java.util.{Random => JavaRandom}
import scala.util.hashing.MurmurHash3

/** XORShift PRNG bit-compatible with the one the reference uses to seed its
  * prototype sampling (reference `som/SOM.scala:362-392`): a Marsaglia
  * xorshift64 core (21/35/4 shift triple) behind `java.util.Random`'s `next`
  * contract, with the seed avalanched through MurmurHash3 so sequential user
  * seeds (0, 1, 2, …) don't produce correlated streams.
  *
  * Same-seed parity with the reference therefore holds for every derived
  * draw: `nextInt`, `nextDouble`, `nextGaussian`, … all funnel through
  * [[next]].
  */
class XORShiftRandom(init: Long) extends JavaRandom(init) {

  def this() = this(System.nanoTime)

  private var seed = XORShiftRandom.hashSeed(init)

  override protected def next(bits: Int): Int = {
    var nextSeed = seed ^ (seed << 21)
    nextSeed ^= (nextSeed >>> 35)
    nextSeed ^= (nextSeed << 4)
    seed = nextSeed
    (nextSeed & ((1L << bits) - 1)).toInt
  }

  override def setSeed(s: Long): Unit = {
    seed = XORShiftRandom.hashSeed(s)
  }
}

object XORShiftRandom {
  /** Avalanche a user seed: murmur the seed bytes twice (second pass chained
    * on the first) into a full 64-bit state.
    *
    * NOTE the `Long.SIZE` (= 64) byte buffer — the seed occupies the first 8
    * bytes and the remaining 56 are zero. That is a quirk inherited verbatim
    * from the reference (reference `som/SOM.scala:386-391`, itself vendored
    * from Spark): allocating `Long.BYTES` instead would produce a different
    * avalanched state, and hence different `takeSample` prototypes, for every
    * user seed. Bit-parity requires reproducing the quirk. */
  def hashSeed(seed: Long): Long = {
    val bytes = ByteBuffer.allocate(java.lang.Long.SIZE).putLong(seed).array()
    val lowBits = MurmurHash3.bytesHash(bytes)
    val highBits = MurmurHash3.bytesHash(bytes, lowBits)
    (highBits.toLong << 32) | (lowBits.toLong & 0xFFFFFFFFL)
  }
}
