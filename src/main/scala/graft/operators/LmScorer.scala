package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MODEL-BASED quality scoring: a bigram language model with add-one
  * smoothing, trained on an in-corpus "clean" subset, scoring every document
  * by its average per-token surprisal — the learned complement to the
  * rule-based Gopher filter (`TextOps` length/alpha/stopword heuristics).
  * A gibberish document can pass every rule (right length, has stopwords,
  * alphabetic) while its token SEQUENCES remain improbable; the LM catches
  * exactly that (the KenLM-perplexity filter of public pretraining
  * pipelines, e.g. CCNet/Gopher, in distributed form).
  *
  * Float discipline: no logarithms cross an engine boundary. Each bigram
  * occurrence (a,b) scores an INTEGER surprisal
  * `bits = floor(log2((c1(a)+V) / (c(a,b)+1)))` — the add-one bigram
  * log-probability floor-quantized to whole bits — computed as
  * `length(bin(q))-1` of the integer quotient q, so Spark and a SQL oracle
  * derive bit-identical scores with pure integer arithmetic. A document is
  * kept iff `4·total_bits ≤ maxQuarterBits · n_bigrams` (integer
  * comparison, no division; quarter-bit threshold granularity because a
  * templated corpus's surprisal band is narrower than one bit per token).
  * Unseen contexts and unseen bigrams degrade gracefully:
  * coalesced zero counts give the maximal `floor(log2(V))`-ish surprisal.
  *
  * Scale shape: one token-explode scan per side; training counts are one
  * groupBy shuffle over the clean subset's bigram stream; scoring is two
  * shuffle joins of the corpus bigram stream against the count tables,
  * co-partitioned on the join key (at 100 TB the count tables would be
  * bucketed once and reused across scoring runs). The vocabulary size V is
  * the only driver-side value — a single long.
  */
object LmScorer {

  /** floor(log2(q)) for a positive integer column, via the binary-string
    * length — integer-exact in Spark and DuckDB alike (`bin` in both). */
  private def floorLog2(q: org.apache.spark.sql.Column) = length(bin(q)) - 1

  /** Score every doc of `docs` under a bigram LM trained on `trainIds`
    * (one column named like `id` — typically the rule-based filter's keep
    * set). Returns (id, n_bigrams, lm_bits, keep) with keep = 1 iff
    * 4·lm_bits ≤ maxQuarterBits · n_bigrams. Docs with fewer than 2 tokens
    * score 0 bits over 0 bigrams and are kept. */
  def lmQuality(docs: DataFrame, trainIds: DataFrame, id: String, text: String,
                maxQuarterBits: Int): DataFrame = {
    val toks = docs.select(col(id), TextOps.tokensFast(col(text)).as("t"))
    // bigram stream: arrays_zip of the token array against its own tail —
    // no higher-order lambda re-inlining (the SegmentsN lesson), one explode
    val bigrams = toks
      .where(size(col("t")) >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("a"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("b"))).as("p"))
      .select(col(id), col("p.a").as("a"), col("p.b").as("b"))
    val train = bigrams.join(trainIds, Seq(id), "left_semi")
    val cab = train.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
    val c1 = train.groupBy(col("a")).agg(count(lit(1)).as("c1"))
    // vocabulary: distinct tokens of the training docs, ALL positions
    val v = toks.join(trainIds, Seq(id), "left_semi")
      .select(explode(col("t")).as("tok")).distinct().count()
    val scored = bigrams
      .join(cab, Seq("a", "b"), "left_outer")
      .join(c1, Seq("a"), "left_outer")
      // `div`, not `/`: Spark's `/` on longs is DOUBLE division — the
      // integer quotient is what keeps floor(log2(·)) exact cross-engine
      .withColumn("q", expr(s"(coalesce(c1, 0L) + ${v}L) div (coalesce(cab, 0L) + 1L)"))
      .select(col(id), floorLog2(col("q")).as("bits"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits")).cast("long").as("lm_bits"))
    docs.select(col(id))
      .join(scored, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_bits"), lit(0L)).as("lm_bits"))
      .withColumn("keep",
        (col("lm_bits") * 4 <= col("n_bigrams") * maxQuarterBits).cast("int"))
  }

  /** Extra whole bits charged when a trigram context is unseen and the
    * score BACKS OFF to the bigram — the integer floor of stupid
    * backoff's −log2(0.4) ≈ 1.32 (Brants et al. 2007, "Large Language
    * Models in Machine Translation"). */
  val BackoffBits = 1

  /** TRIGRAM back-off upgrade of [[lmQuality]] (the KenLM shape, in the
    * same integer-bits discipline): each trigram occurrence (a,b,c) scores
    *  - context SEEN in training (c2(a,b) > 0):
    *    `floor(log2((c2(a,b)+V) / (c3(a,b,c)+1)))` — add-one trigram
    *    surprisal, the bigram formula one order up;
    *  - context UNSEEN: [[BackoffBits]] +
    *    `floor(log2((c1(b)+V) / (cbc(b,c)+1)))` — stupid backoff to the
    *    add-one BIGRAM score of (b,c), penalty quantized to whole bits.
    * The upgrade catches exactly the gibberish a bigram passes: text
    * chained from individually-frequent word PAIRS scores low order-2
    * surprisal, but its order-3 contexts are unseen, so every token pays
    * the backoff penalty + the (still modest) bigram bits — LmScorerSpec
    * plants that corpus and pins the separation.
    *
    * Scale shape, unchanged from the bigram: one token-explode scan per
    * side; training is TWO grouped counts over the clean subset's trigram
    * stream plus the bigram tables the order-2 model already builds (a
    * production run trains both orders in one pass); scoring joins the
    * corpus trigram stream against four co-partitioned count tables.
    * Docs with < 3 tokens score 0 bits over 0 trigrams and are kept. */
  def lmQuality3(docs: DataFrame, trainIds: DataFrame, id: String, text: String,
                 maxQuarterBits: Int): DataFrame = {
    val toks = docs.select(col(id), TextOps.tokensFast(col(text)).as("t"))
    val trigrams = toks
      .where(size(col("t")) >= 3)
      .select(col(id), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 2).as("a"),
        slice(col("t"), lit(2), size(col("t")) - 2).as("b"),
        slice(col("t"), lit(3), size(col("t")) - 2).as("c"))).as("p"))
      .select(col(id), col("p.a").as("a"), col("p.b").as("b"), col("p.c").as("c"))
    val bigrams = toks
      .where(size(col("t")) >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("a"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("b"))).as("p"))
      .select(col(id), col("p.a").as("a"), col("p.b").as("b"))
    val train3 = trigrams.join(trainIds, Seq(id), "left_semi")
    val trainBg = bigrams.join(trainIds, Seq(id), "left_semi")
    val c3 = train3.groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("c3"))
    val c2 = train3.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    // back-off tables keyed on the trigram's LAST pair (b,c)
    val cbc = trainBg.groupBy(col("a").as("b"), col("b").as("c"))
      .agg(count(lit(1)).as("cbc"))
    val c1 = trainBg.groupBy(col("a").as("b")).agg(count(lit(1)).as("c1"))
    val v = toks.join(trainIds, Seq(id), "left_semi")
      .select(explode(col("t")).as("tok")).distinct().count()
    val scored = trigrams
      .join(c3, Seq("a", "b", "c"), "left_outer")
      .join(c2, Seq("a", "b"), "left_outer")
      .join(cbc, Seq("b", "c"), "left_outer")
      .join(c1, Seq("b"), "left_outer")
      .withColumn("bits",
        when(col("c2").isNotNull,
          floorLog2(expr(s"(c2 + ${v}L) div (coalesce(c3, 0L) + 1L)")))
          .otherwise(lit(BackoffBits) +
            floorLog2(expr(s"(coalesce(c1, 0L) + ${v}L) div (coalesce(cbc, 0L) + 1L)"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("bits")).cast("long").as("lm_bits"))
    docs.select(col(id))
      .join(scored, Seq(id), "left_outer")
      .select(col(id),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("lm_bits"), lit(0L)).as("lm_bits"))
      .withColumn("keep",
        (col("lm_bits") * 4 <= col("n_trigrams") * maxQuarterBits).cast("int"))
  }
}
