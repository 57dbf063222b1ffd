package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the BPE kernel to the replace-chain semantics the DuckDB oracle
  * replays: `Bpe.tokenizeDoc` (array merging) must equal `Bpe.replayTokens`
  * (wrapped-string Java String.replace chain — the literal shape of the
  * generated oracle SQL) on hand cases, adversarial repeats, and the real
  * corpus. The CORRECTNESS gate then pins DuckDB to the same chain.
  */
class BpeSpec extends SparkSpec {

  private def toks(s: String): Seq[String] =
    Bpe.tokenizeDoc(UTF8String.fromString(s)).array.map(_.toString).toSeq

  test("hand cases: merges apply in table order, leftmost non-overlapping") {
    assert(toks("the") == Seq("the"))
    assert(toks("nation") == Seq("n", "ation"))
    assert(toks("") == Seq.empty)
    assert(Bpe.countDoc(null) == 0)
    assert(Bpe.tokenizeDoc(null).numElements() == 0)
    // spaces separate words; merges never cross the boundary
    assert(toks("t h") == Seq("t", "h"))
    // punctuation = single-symbol words
    assert(toks("a,b") == Seq("a", ",", "b"))
    // digits: (2,0) merges leftmost pair first, then (0,0) — never (20,0)
    assert(toks("2000") == Seq("20", "00"))
  }

  test("kernel == replace-chain replay on adversarial strings") {
    val cases = Seq(
      "ththe", "thththth", "aaaa", "the the the", "xthex",
      "weatherworn", "internationalization", "authenticated",
      "1999 2000 2020", "don't stop—ever", "naïve café déjà-vu",
      "controlcharshere", "  double  spaces  ",
      "", " ", "a", "𝕊urrogate 𝄞pairs", "MixedCASE Words")
    for (s <- cases) {
      assert(toks(s) == Bpe.replayTokens(s).toSeq, s"diverged on: $s")
      assert(Bpe.countDoc(UTF8String.fromString(s)) == Bpe.replayTokens(s).length)
    }
  }

  test("kernel == replace-chain replay on the real corpus (sf0.001)") {
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    for (t <- texts) {
      val replay = Bpe.replayTokens(t).toSeq
      assert(toks(t) == replay, s"diverged on doc: ${t.take(60)}")
    }
    // BPE compresses: real merges fire on English text
    val chars = texts.map(_.count(_ != ' ')).sum.toDouble
    val nToks = texts.map(t => Bpe.countDoc(UTF8String.fromString(t))).sum.toDouble
    assert(nToks < chars * 0.7, s"merges barely fire: $nToks tokens / $chars chars")
  }

  test("column expressions: count == size(tokens), codegen and eval agree") {
    import spark.implicits._
    val df = Seq("the nation of spark", "a,b 2000", "", "naïve")
      .toDF("text")
      .select(BpeKernels.bpeCount(col("text")).as("n"),
        size(BpeKernels.bpeTokens(col("text"))).as("m"))
    assert(df.collect().forall(r => r.getInt(0) == r.getInt(1)))
  }
}
