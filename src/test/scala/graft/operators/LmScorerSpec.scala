package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LmScorerSpec extends SparkSpec {
  import spark.implicits._

  // 30 clean docs: natural, repetitive phrasing (high bigram counts), with
  // stopwords — a corpus of the shape the rule-based filter was built for.
  private val clean = (0L until 30L).map { i =>
    val s = Seq(
      "the quick brown fox jumps over the lazy dog and the cat sat on the mat",
      "the dog ran to the park and the fox slept under the old tree",
      "a bird flew over the house and the cat watched from the warm mat")(
      (i % 3).toInt)
    (i, s"$s $s $s")
  }
  // Gibberish engineered to PASS every rule: 5..5000 tokens, alphabetic
  // ratio >= 0.5, contains the stopword "the" — but every token SEQUENCE is
  // novel, which only the learned model can see.
  private val gibberish =
    (40L, "the " + (0 until 40).map(i => s"zq${('a' + i % 26).toChar}xv${('a' + i / 26).toChar}").mkString(" "))
  private val docs = (clean :+ gibberish).toDF("doc_id", "text")

  test("the rule-based filter passes the gibberish doc") {
    val t = TextOps.tokens(col("text"))
    val rulePass = docs.select(col("doc_id"))
      .where(size(t).between(5, 5000) &&
        TextOps.alphaRatio(col("text")) >= 0.5 &&
        TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en")) >= 1)
      .as[Long].collect().toSet
    assert(rulePass.contains(40L), "gibberish must slip through the rules")
    assert((0L until 30L).forall(rulePass.contains))
  }

  test("bigram LM flags the gibberish doc the rules passed") {
    // train on everything the rules keep — gibberish INCLUDED, as in the
    // catalog pipeline; its singleton bigrams still score near-max surprisal
    val scored = LmScorer.lmQuality(docs, docs.select(col("doc_id")),
        "doc_id", "text", maxQuarterBits = 14)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val perTok = scored.map { case (id, (n, bits, _)) => id -> bits.toDouble / n }
    assert(perTok(40L) > (0L until 30L).map(perTok).max,
      "gibberish must out-surprise every clean doc")
    assert(scored(40L)._3 == 0, "gibberish dropped")
    assert((0L until 30L).forall(scored(_)._3 == 1), "clean docs kept")
  }

  // BIGRAM-CHAINED gibberish: every consecutive PAIR appears in the clean
  // corpus (pivoting mid-phrase across source sentences), so the order-2
  // model sees nothing unusual — but the pivots create trigram contexts /
  // trigrams the training set never contains.
  private val chained =
    (41L, "the quick brown fox slept under the warm mat the cat watched from the old tree")

  test("trigram back-off flags bigram-chained gibberish the bigram LM passes") {
    val docs2 = (clean :+ chained).toDF("doc_id", "text")
    val ids = docs2.select(col("doc_id"))
    def perUnit(rows: Array[org.apache.spark.sql.Row]): Map[Long, Double] =
      rows.map(r => r.getLong(0) ->
        (if (r.getLong(1) == 0) 0.0 else r.getLong(2).toDouble / r.getLong(1))).toMap
    val bg = perUnit(LmScorer.lmQuality(docs2, ids, "doc_id", "text", 14).collect())
    val tg = perUnit(LmScorer.lmQuality3(docs2, ids, "doc_id", "text", 14).collect())
    val cleanIds = (0L until 30L)
    val (bgCleanMax, tgCleanMax) =
      (cleanIds.map(bg).max, cleanIds.map(tg).max)
    info(s"bits/unit — bigram: chained ${bg(41L)}, clean max $bgCleanMax; " +
      s"trigram: chained ${tg(41L)}, clean max $tgCleanMax")
    // the order-2 model scores the chained doc INSIDE the clean band (its
    // pairs are all high-count): no bigram threshold separates it without
    // also dropping a clean doc
    assert(bg(41L) <= bgCleanMax,
      s"fixture broken: bigram already separates (${bg(41L)} > $bgCleanMax)")
    // the order-3 model pushes it STRICTLY above every clean doc — a
    // threshold in the gap drops it and keeps the corpus
    assert(tg(41L) > tgCleanMax + 0.5,
      s"trigram must separate the chained doc: ${tg(41L)} vs $tgCleanMax")
  }

  test("trigram scorer: sub-3-token docs score 0 over 0 trigrams and are kept") {
    val tiny = Seq((1L, "one two"), (2L, "")).toDF("doc_id", "text")
    val out = LmScorer.lmQuality3(tiny, tiny.select(col("doc_id")),
        "doc_id", "text", maxQuarterBits = 14)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out(1L) == (0L, 0L, 1) && out(2L) == (0L, 0L, 1))
  }

  test("sub-2-token docs score 0 over 0 bigrams and are kept") {
    val tiny = Seq((1L, "single"), (2L, "")).toDF("doc_id", "text")
    val out = LmScorer.lmQuality(tiny, tiny.select(col("doc_id")),
        "doc_id", "text", maxQuarterBits = 14)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(out(1L) == (0L, 0L, 1) && out(2L) == (0L, 0L, 1))
  }
}
