package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact repeated-span (substring) dedup — the windowed re-expression of
  * Lee et al. 2022. Fixtures plant a verbatim run copied across docs and
  * check the inventory finds it, the scrub removes every copy EXCEPT the
  * corpus-first one, merges overlapping windows, and leaves clean docs
  * untouched. */
class SpanDedupSpec extends SparkSpec {

  private val W = 4

  // doc 0: original. doc 1: copies a 6-token run from doc 0 (tokens 2..7)
  // inside otherwise-unique text. doc 2: exact dup of doc 0. doc 3: clean.
  // doc 4: shorter than W (whole-text span). doc 5: exact dup of doc 4.
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "a0 a1 c0 c1 c2 c3 c4 c5 a2 a3"),
      (1L, "b0 b1 b2 c0 c1 c2 c3 c4 c5 b3 b4"),
      (2L, "a0 a1 c0 c1 c2 c3 c4 c5 a2 a3"),
      (3L, "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9"),
      (4L, "e0 e1"),
      (5L, "e0 e1"),
    ).toDF("doc_id", "text")
  }

  test("inventory finds exactly the cross-doc duplicated spans") {
    val inv = Dedup.spanInventory(docs, "doc_id", "text", W)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // doc0/doc2 share all 7 windows; doc1 shares the 3 windows fully inside
    // the copied run (c0..c5); docs 4/5 share the whole-text span.
    // Shared windows: doc0's 7 windows each in doc0+doc2 (2 docs), of which
    // the 3 all-c windows are also in doc1 (3 docs). Plus the e0-e1 span.
    val all = Dedup.spanInventory(docs, "doc_id", "text", W).collect()
    assert(all.length === 8, all.mkString("\n"))
    assert(inv.count(_._1 == 3L) === 3)   // the three c-only windows
    assert(inv.count(_._1 == 2L) === 5)   // 4 mixed a/c windows + e0-e1
    // every first occurrence is in doc 0 (or doc 4 for the short pair)
    assert(inv.forall(t => t._3 == 0L || t._3 == 4L))
  }

  test("scrub keeps the corpus-first copy, empties exact dups, merges overlaps") {
    val out = Dedup.spanScrub(docs, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(0L) === ("a0 a1 c0 c1 c2 c3 c4 c5 a2 a3", 0L)) // first copy intact
    assert(out(2L) === ("", 10L))                             // exact dup emptied
    assert(out(3L) === ("d0 d1 d2 d3 d4 d5 d6 d7 d8 d9", 0L)) // clean doc intact
    // doc 1: the three duplicated windows c0..c3, c1..c4, c2..c5 overlap —
    // merged to ONE interval covering exactly tokens 3..8, i.e. the copied
    // run c0..c5 and nothing else (the union of duplicated windows equals
    // the duplicated run; surrounding unique text survives).
    assert(out(1L) === ("b0 b1 b2 b3 b4", 6L))
    // short exact-dup pair: first survives, second empties
    assert(out(4L) === ("e0 e1", 0L))
    assert(out(5L) === ("", 2L))
  }

  test("a corpus with no repeats scrubs to itself") {
    import spark.implicits._
    val clean = Seq((7L, "x0 x1 x2 x3 x4 x5"), (8L, "y0 y1 y2 y3 y4 y5"))
      .toDF("doc_id", "text")
    val out = Dedup.spanScrub(clean, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(7L) === ("x0 x1 x2 x3 x4 x5", 0L))
    assert(out(8L) === ("y0 y1 y2 y3 y4 y5", 0L))
    assert(Dedup.spanInventory(clean, "doc_id", "text", W).count() === 0L)
  }
}
