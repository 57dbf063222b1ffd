package graft.operators

import graft.SparkSpec
import graft.functions.Bpe

class BpeTrainerSpec extends SparkSpec {

  test("round-1 merge is the hand-countable most frequent adjacent pair") {
    import spark.implicits._
    // "aa" x3 words + "ab" x1: pair (a,a) freq 3, (a,b) freq 1
    val docs = Seq("aa aa", "aa ab").toDF("text")
    val learned = BpeTrainer.train(docs, "text", rounds = 1).collect()
    assert(learned.length == 1)
    assert((learned(0).getString(1), learned(0).getString(2)) == ("a", "a"))
    assert(learned(0).getLong(3) == 3L)
  }

  test("overlapping pairs count per occurrence; merges apply before next round") {
    import spark.implicits._
    // "aaa": pairs (a,a) twice per word occurrence — the standard training
    // count. After merging (a,a), round 2 sees [aa, a] → pair (aa, a).
    val docs = Seq("aaa", "aaa").toDF("text")
    val learned = BpeTrainer.train(docs, "text", rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(learned(0) == ((1, "a", "a", 4L)))   // 2 per word x 2 words
    assert(learned(1) == ((2, "aa", "a", 2L)))  // the post-merge pair
  }

  test("training is deterministic and learned merges compress the corpus") {
    import spark.implicits._
    val texts = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("text").as[String].collect().toSeq
    val docs = texts.toDF("text")
    val a = BpeTrainer.train(docs, "text", rounds = 5).collect().toSeq
    val b = BpeTrainer.train(docs, "text", rounds = 5).collect().toSeq
    assert(a == b, "same corpus must learn the same merges")
    val merges = a.map(r => (r.getString(1), r.getString(2)))
    // applying the learned merges must shorten the corpus token stream
    val totBefore = texts.map(t => {
      var n = 0; val it = Bpe.preTokens(t).iterator()
      while (it.hasNext) n += Bpe.encodeWordWith(it.next(), Nil).length
      n
    }).sum
    val totAfter = texts.map(t => {
      var n = 0; val it = Bpe.preTokens(t).iterator()
      while (it.hasNext) n += Bpe.encodeWordWith(it.next(), merges).length
      n
    }).sum
    assert(totAfter < totBefore, s"learned merges must compress: $totBefore -> $totAfter")
  }
}
