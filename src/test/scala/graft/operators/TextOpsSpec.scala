package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def one(text: String) = {
    import spark.implicits._
    Seq((0L, text)).toDF("doc_id", "text")
  }

  test("tokens drops empties from repeated/leading/trailing spaces") {
    val t = one("  a  b c ").select(TextOps.tokens(col("text"))).head().getSeq[String](0)
    assert(t == Seq("a", "b", "c"))
  }

  test("shingles3: sliding 3-grams, whole text when short") {
    val s = one("a b c d").select(TextOps.shingles3(col("text"))).head().getSeq[String](0)
    assert(s == Seq("a b c", "b c d"))
    val short = one("a b").select(TextOps.shingles3(col("text"))).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("preTokenCount splits letter runs, digit runs, single punct") {
    val n = one("hello world42 x!?").select(TextOps.preTokenCount(col("text"))).head().getInt(0)
    // hello | world | 42 | x | ! | ?
    assert(n == 6)
  }

  test("bpeTokenCount is the REAL post-merge count (== replay, < char count)") {
    val s = "hello world42 x!?"
    val n = one(s).select(TextOps.bpeTokenCount(col("text"))).head().getInt(0)
    assert(n == graft.functions.Bpe.replayTokens(s).length)
    assert(n > 6 && n < s.count(_ != ' ')) // merges fired, but finer than words
  }

  test("alphaRatio counts letters over total chars") {
    val r = one("ab12").select(TextOps.alphaRatio(col("text"))).head().getDouble(0)
    assert(r == 0.5)
  }

  test("stopwordHits counts every occurrence, not distinct") {
    val n = one("the cat the dog the").select(
      TextOps.stopwordHits(col("text"), Seq("the", "a"))).head().getInt(0)
    assert(n == 3)
  }

  test("langid stopword tables are disjoint enough to discriminate") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat and the dog of a house is big"),
      (1L, "der hund und die katze ist ein tier"),
    ).toDF("doc_id", "text")
    val en = docs.select(col("doc_id"), TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("en")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val de = docs.select(col("doc_id"), TextOps.stopwordHits(col("text"), TextOps.StopwordTable.toMap.apply("de")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(en(0L) > de(0L))
    assert(de(1L) > en(1L))
  }

  test("poison rows: null and empty text survive every text op without crashing") {
    import spark.implicits._
    // a crawl corpus WILL contain null/empty/whitespace docs; every signal
    // must degrade to a well-defined value, never throw or return -1 rows
    val poison = Seq((0L, null: String), (1L, ""), (2L, "   "), (3L, "ok doc here"))
      .toDF("doc_id", "text")
    val out = poison.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).as("nt"),
      TextOps.repetitionRatio(col("text")).as("rep"),
      TextOps.stopwordHits(col("text"), Seq("ok")).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 3),
      "token counts must be 0 (never -1) for null/empty/blank text")
    // dedup pipeline end-to-end on the poisoned corpus: no crash, sane rows
    assert(Dedup.exactSurvivors(poison.where(col("text").isNotNull), "doc_id", "text").count() == 3)
    assert(Dedup.minhashSignatures(
      Dedup.docShinglesRaw(poison.where(col("text").isNotNull), "doc_id", "text")).count() == 3 * Dedup.NumMinhash)
  }

  test("PII redaction: counts + scrub chain, clean text untouched") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail a.b+c@sub.example.org or bob@ex.com now"),
      (2L, "call +1 at 555-123-4567 then 555-000-9999"),
      (3L, "leak sk_abcDEF0123456789xyz and tok_ABCDEFGHIJKLMNOP1"),
      (4L, "no pii here, just 12-34 and name_at_place"),
    ).toDF("doc_id", "text")
    val (ne, np, nk) = TextOps.piiCounts(col("text"))
    val out = rows.select(col("doc_id"), ne.as("e"), np.as("p"), nk.as("k"),
        TextOps.piiRedact(col("text")).as("red"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)), r.getString(4))).toMap
    assert(out(1L)._1 == ((2, 0, 0)))
    assert(out(1L)._2 == "mail [EMAIL] or [EMAIL] now")
    assert(out(2L)._1 == ((0, 2, 0)))
    assert(out(2L)._2 == "call +1 at [PHONE] then [PHONE]")
    assert(out(3L)._1 == ((0, 0, 2)))
    assert(out(3L)._2 == "leak [KEY] and [KEY]")
    assert(out(4L)._1 == ((0, 0, 0)))
    assert(out(4L)._2 == "no pii here, just 12-34 and name_at_place")
  }

  test("URL canonicalization: every normalization rule, on hand URLs") {
    import spark.implicits._
    val cases = Seq(
      // scheme + host lowercase; path case preserved
      ("HTTPS://WWW.Example.COM/Path/To", "https://example.com/Path/To"),
      // default ports stripped, either scheme
      ("https://a.com:443/x", "https://a.com/x"),
      ("http://a.com:80/x", "http://a.com/x"),
      // non-default port kept
      ("https://a.com:8443/x", "https://a.com:8443/x"),
      // fragment stripped
      ("https://a.com/x#section-2", "https://a.com/x"),
      // trailing slashes stripped (also multiple)
      ("https://a.com/x/", "https://a.com/x"),
      ("https://a.com/x///", "https://a.com/x"),
      // tracking params dropped, survivors sorted, empty query elided
      ("https://a.com/x?utm_source=f&utm_campaign=c&fbclid=abc", "https://a.com/x"),
      ("https://a.com/x?b=2&a=1&utm_medium=m", "https://a.com/x?a=1&b=2"),
      // a param NAMED like but not equal to a tracker survives
      ("https://a.com/x?autm_x=1", "https://a.com/x?autm_x=1"),
      // www. stripped only as a leading label
      ("https://www.a.com/x", "https://a.com/x"),
      ("https://wwwa.com/x", "https://wwwa.com/x"),
      // empty path stays empty
      ("https://a.com?a=1", "https://a.com?a=1"),
    )
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), TextOps.urlCanonicalize(col("u")).as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (raw, want) => assert(out(raw) == want, s"raw=$raw") }
    // idempotence: canonical forms are fixed points
    val canon = cases.map(_._2).distinct.toDF("u")
      .select(col("u"), TextOps.urlCanonicalize(col("u")).as("c")).collect()
    canon.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }
}
