package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-bucket skew guard (VERDICT r2 ask #4): a 1000-copy exact-dup cluster
  * must NOT produce a quadratic pair list out of the banded joins. With the
  * star fallback the hot (band,key)/(chunk,ckey) buckets emit df−1 hub pairs
  * instead of df²/2, while cluster-level connectivity (what the keep-list
  * consumes) is preserved and cold buckets keep exact all-pairs semantics.
  */
class DedupSkewSpec extends SparkSpec {

  private val Copies = 1000

  private lazy val corpus = {
    import spark.implicits._
    val dupes = (0 until Copies).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val distinct = Seq(
      (5000L, "completely different content about spark query engines at scale"),
      (5001L, "completely different content about spark query engines at speed"), // near dup of 5000
      (5002L, "unrelated third text mentioning neither animals nor engines here"))
    (dupes ++ distinct).toDF("doc_id", "text")
  }

  test("lshCandidates with maxBandDf stays linear on a 1000-copy cluster") {
    val sig = Dedup.minhashSignatures(Dedup.docShingles(corpus, "doc_id", "text"))
      .localCheckpoint(true)
    val capped = Dedup.lshCandidates(sig, maxBandDf = Some(8)).localCheckpoint(true)
    val n = capped.count()
    // star: 999 hub pairs for the cluster + possibly the planted near-dup pair
    assert(n <= 2L * Copies, s"capped candidate pairs not linear: $n")
    // every cluster member reaches the hub (doc 0)
    val hubDeg = capped.where(col("doc_a") === 0L || col("doc_b") === 0L).count()
    assert(hubDeg == Copies - 1, s"hub degree $hubDeg != ${Copies - 1}")
    // cold buckets keep exact semantics: the near-dup pair outside the
    // cluster is still found
    assert(capped.where(col("doc_a") === 5000L && col("doc_b") === 5001L).count() == 1)
  }

  test("uncapped lshCandidates IS quadratic on the same cluster (the hazard)") {
    val sig = Dedup.minhashSignatures(
      Dedup.docShingles(corpus.where(col("doc_id") < 100), "doc_id", "text"))
    // 100 copies uncapped -> C(100,2) pairs; proves the guard guards something
    assert(Dedup.lshCandidates(sig, maxBandDf = None).count() == 4950)
  }

  test("simhashPairs with maxChunkDf stays linear and keeps exact hamming") {
    val sh = Dedup.simhash(corpus, "doc_id", "text").localCheckpoint(true)
    val capped = Dedup.simhashPairs(sh, maxHamming = 3, maxChunkDf = Some(8))
      .localCheckpoint(true)
    val n = capped.count()
    assert(n <= 2L * Copies, s"capped simhash pairs not linear: $n")
    // hub pairs carry true hamming (identical copies -> 0)
    val hams = capped.where(col("doc_a") === 0L).select("hamming")
      .collect().map(_.getInt(0))
    assert(hams.length == Copies - 1 && hams.forall(_ == 0))
  }

  test("keep-list collapses the capped star cluster to one canonical") {
    val sig = Dedup.minhashSignatures(Dedup.docShingles(corpus, "doc_id", "text"))
    val pairs = Dedup.lshCandidates(sig, maxBandDf = Some(8))
    val keep = Dedup.keepList(corpus, "doc_id", pairs, rounds = 3)
    val canon = keep.where(col("doc") < Copies).select("canonical")
      .distinct().collect().map(_.getLong(0))
    assert(canon.toSeq == Seq(0L), s"cluster canonicals: ${canon.mkString(",")}")
  }
}
