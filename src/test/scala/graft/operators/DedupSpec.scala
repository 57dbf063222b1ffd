package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy cat again and again"), // near dup
      (3L, "completely different content about spark query engines at scale"),
      (4L, "tiny"),
    ).toDF("doc_id", "text")
  }

  test("exact dedup keeps min-id survivor per digest") {
    val out = Dedup.exactSurvivors(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 0 and 1 collapse
    val dupGroup = out.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 0L)
  }

  test("shingles: L-2 of them for L>=3 tokens, whole text below") {
    val sh = Dedup.docShingles(docs, "doc_id", "text")
    val counts = sh.groupBy("doc").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(3L) == 9 - 2) // 9 tokens -> 7 3-shingles
    assert(counts(4L) == 1) // "tiny" -> the text itself
    val first = sh.where(col("doc") === 3L).select("sh").collect().map(_.getString(0))
    assert(first.contains("completely different content"))
  }

  test("minhash: identical docs share all signatures; near-dups share most") {
    val sig = Dedup.minhashSignatures(Dedup.docShingles(docs, "doc_id", "text"))
    val byDoc = sig.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap).toMap
    assert(byDoc(0L) == byDoc(1L))
    val shared23 = (0 until 16).count(h => byDoc(0L)(h) == byDoc(2L)(h))
    assert(shared23 >= 8, s"near-dups shared only $shared23/16 minhashes")
    val shared03 = (0 until 16).count(h => byDoc(0L)(h) == byDoc(3L)(h))
    assert(shared03 <= 4, s"unrelated docs shared $shared03/16 minhashes")
  }

  test("LSH candidates + exact jaccard find the planted dup pairs only") {
    val ds = Dedup.docShingles(docs, "doc_id", "text")
    val cand = Dedup.lshCandidates(Dedup.minhashSignatures(ds))
    val pairs = Dedup.jaccardPairs(ds, 0.5, candidates = Some(cand)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("jaccard df-cap drops ubiquitous shingles") {
    val ds = Dedup.docShingles(docs, "doc_id", "text")
    val capped = Dedup.jaccardPairs(ds, 0.0, maxShingleDf = Some(1)).collect()
    assert(capped.isEmpty) // every shared shingle has df >= 2 and is dropped
  }

  test("containment: a doc fully inside a larger one scores 1e6 that way only") {
    import spark.implicits._
    // a = "x y z w" → 2 shingles, both inside b = "x y z w q r" (4 shingles):
    // C(a→b) = 2/2 = 1e6 ppm, C(b→a) = 2/4 = 5e5 ppm — only a→b passes 80%
    val d = Seq((0L, "x y z w"), (1L, "x y z w q r"), (2L, "p q r s t u"))
      .toDF("doc_id", "text")
    val r = Dedup.containmentPairs(
        Dedup.docShinglesRaw(d, "doc_id", "text"), minContainPpm = 800000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSet
    assert(r == Set((0L, 1L, 2L, 2L, 1000000L)))
    // at a lower bar the reverse orientation emits too, from the SAME
    // intersection row
    val both = Dedup.containmentPairs(
        Dedup.docShinglesRaw(d, "doc_id", "text"), minContainPpm = 500000L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(4))).toSet
    assert(both == Set((0L, 1L, 1000000L), (1L, 0L, 500000L)))
  }

  test("simhash: equal for identical docs, close for near-dups, 60-bit range") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
    val hamming02 = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    val hamming03 = java.lang.Long.bitCount(sh(0L) ^ sh(3L))
    assert(hamming02 < hamming03)
  }

  test("simhash pair search finds identical pair at hamming 0") {
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs, "doc_id", "text"), maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 1L)).contains(0))
  }

  test("adaptive block count: grows with corpus, key width meets bitsPerBand") {
    // b=4 serves small corpora; the thresholds are exact integer arithmetic
    // (60-bit: 4→15 key bits ⟹ n ≤ 2^13; 5→24 ⟹ n ≤ 2^22; 6→30 ⟹ 2^28)
    assert(Dedup.simhashBlockCount(60, 500) == 4)
    assert(Dedup.simhashBlockCount(60, 8192) == 4)     // kb=15 boundary
    assert(Dedup.simhashBlockCount(60, 8193) == 5)     // kb=16
    assert(Dedup.simhashBlockCount(60, 4000000) == 5)  // kb=24 boundary area
    assert(Dedup.simhashBlockCount(60, 5000000) == 6)
    assert(Dedup.simhashBlockCount(60, 300000000L) == 8)
    // 56-bit fingerprints: ceil(56/4)=14 → 4 blocks only up to kb 14 (n ≤ 2^12)
    assert(Dedup.simhashBlockCount(56, 4096) == 4)
    assert(Dedup.simhashBlockCount(56, 4097) == 5)
    assert(Dedup.simhashBlockCount(56, 500000) == 6)   // the sf10 image corpus size
    // ceiling: never past the largest candidate
    assert(Dedup.simhashBlockCount(60, Long.MaxValue / 2) == 12)
  }

  test("pigeonhole recall holds at every block count: hamming<=3 pairs always share a band") {
    import spark.implicits._
    // 200 planted pairs: doc 2i is a random 60-bit hash, doc 2i+1 the same
    // hash with 1..3 bits flipped at random positions. For EVERY candidate
    // block count the banding must emit all 200 pairs — the pigeonhole
    // guarantee is what lets b grow with the corpus without losing recall.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).flatMap { i =>
      val h = rnd.nextLong() & ((1L << 60) - 1)
      val flips = 1 + rnd.nextInt(3)
      val flipped = (0 until flips).foldLeft(h) { (acc, _) =>
        acc ^ (1L << rnd.nextInt(60))
      }
      Seq((2L * i, h), (2L * i + 1, flipped))
    }
    val hashes = rows.toDF("doc", "simhash")
    for (b <- Seq(4, 5, 6, 8, 10, 12)) {
      val found = Dedup.simhashChunks(hashes, 60, b, 3)
      val pairs = found.as("a").join(found.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
            col("a.doc") < col("b.doc"))
        .select(col("a.doc"), col("b.doc")).distinct()
        .where(col("b.doc") === col("a.doc") + 1 && col("a.doc") % 2 === 0)
      assert(pairs.count() == 200, s"recall loss at b=$b")
    }
  }

  test("converged keep-list closes a chain longer than any fixed round budget") {
    import spark.implicits._
    // path 0-1-2-...-9: diameter 9. A 3-round budget cannot flood doc 9's
    // label back to 0; the fixpoint loop must.
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ids = (0L to 9L).toDF("doc_id")
    val bounded = Dedup.keepList(ids, "doc_id", chain, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val converged = Dedup.keepListConverged(ids, "doc_id", chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(converged == (0L to 9L).map(_ -> 0L).toMap)
    assert(bounded(9L) != 0L, "3 rounds must NOT close a diameter-9 chain (else this test proves nothing)")
  }

  test("incremental pairs equal a full recompute over the combined corpus") {
    import spark.implicits._
    // old corpus: docs 0, 3; increment: 1 (dup of 0), 2 (near-dup), 4
    // old-old has no pairs; every discovered pair involves a new doc
    val oldDocs = docs.where(col("doc_id").isin(0L, 3L))
    val newIds = Seq(1L, 2L, 4L).toDF("doc")
    val oldSh = Dedup.docShinglesRaw(oldDocs, "doc_id", "text")
    val oldSigs = Dedup.minhashSignatures(oldSh)
    val oldPairs = Dedup.jaccardPairs(oldSh, 0.5,
      candidates = Some(Dedup.lshCandidates(oldSigs)))
    val incremental = Dedup.incrementalPairs(docs, newIds, "doc_id", "text",
        Dedup.bandedTable(oldSigs), oldPairs, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fullSh = Dedup.docShinglesRaw(docs, "doc_id", "text")
    val full = Dedup.jaccardPairs(fullSh, 0.5,
        candidates = Some(Dedup.lshCandidates(Dedup.minhashSignatures(fullSh))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental.nonEmpty && incremental == full)
  }

  test("incremental pairs reject an increment id already in the carried artifact") {
    import spark.implicits._
    val oldSh = Dedup.docShinglesRaw(docs.where(col("doc_id") < 3), "doc_id", "text")
    val oldBanded = Dedup.bandedTable(Dedup.minhashSignatures(oldSh))
    val e = intercept[IllegalArgumentException] {
      // doc 2 is a re-crawl: merging its new minhashes into the old band
      // rows would produce garbage keys — must fail loud
      Dedup.incrementalPairs(docs, Seq(2L, 4L).toDF("doc"), "doc_id", "text",
        oldBanded, oldSh.limit(0).select(col("doc").as("doc_a"),
          col("doc").as("doc_b"), lit(1.0).as("jaccard")))
    }
    assert(e.getMessage.contains("already exist"))
  }

  test("converged keep-list fails LOUD when maxRounds is too small, never silently splits") {
    import spark.implicits._
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val ids = (0L to 9L).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepListConverged(ids, "doc_id", chain, maxRounds = 3).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("maxRounds counts propagation hops: 1 hop suffices for an edgeless graph") {
    import spark.implicits._
    // no duplicate pairs at all — seeding already IS the fixpoint, and the
    // single allowed hop proves it (regression: the pre-r5 loop ran
    // maxRounds-1 hops and threw unconditionally at maxRounds=1)
    val ids = (0L to 4L).toDF("doc_id")
    val none = ids.limit(0).select(col("doc_id").as("doc_a"), col("doc_id").as("doc_b"))
    val got = Dedup.keepListConverged(ids, "doc_id", none, maxRounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L to 4L).map(i => (i, i)).toSet)
  }

  private def contaminationOf(evalIds: Set[Long]) =
    Dedup.contamination(
      Dedup.docShinglesRaw(docs.where(!col("doc_id").isin(evalIds.toSeq: _*)), "doc_id", "text"),
      Dedup.docShinglesRaw(docs.where(col("doc_id").isin(evalIds.toSeq: _*)), "doc_id", "text"))

  test("incremental fingerprint pairs equal full recompute ACROSS an adaptive-width threshold") {
    import spark.implicits._
    // 56-bit family: b=4 up to 4096 hashes, b=5 beyond. Yesterday = 4000
    // (b=4); the 200-doc delta pushes the combined corpus to b=5 — the
    // carried-band-table design would join 4-block keys against 5-block
    // keys and find nothing; re-banding from the carried hashes stays exact.
    val rnd = new scala.util.Random(99)
    def randHash() = rnd.nextLong() & ((1L << 56) - 1)
    val old = (0L until 4000L).map(i => (i, randHash()))
    val fresh = (4000L until 4200L).map { i =>
      if (i % 2 == 1) {
        // near-dup of an OLD doc: only the cross-threshold banding finds it
        val base = old(((i - 4000) * 17 % 4000).toInt)._2
        (i, base ^ (1L << ((i % 56).toInt)))
      } else (i, randHash())
    }
    assert(Dedup.simhashBlockCount(56, 4000) == 4)
    assert(Dedup.simhashBlockCount(56, 4200) == 5)
    val oldDF = old.toDF("doc", "simhash")
    val newDF = fresh.toDF("doc", "simhash")
    val oldPairs = Dedup.simhashPairs(oldDF, maxHamming = 3, hashBits = 56)
    val incr = Dedup.simhashIncrementalPairs(oldDF, newDF, oldPairs, hashBits = 56)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.simhashPairs(oldDF.union(newDF), maxHamming = 3, hashBits = 56)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == full, "increment must equal the full recompute")
    // the planted old-new pairs really straddle the artifact boundary
    assert(fresh.count(f => f._1 % 2 == 1) == 100)
    val straddling = incr.count { case (a, b) => a < 4000 && b >= 4000 }
    assert(straddling >= 100, s"planted cross-boundary near-dups missed: $straddling")
    // disjointness enforcement
    intercept[IllegalArgumentException] {
      Dedup.simhashIncrementalPairs(oldDF, oldDF.limit(1), oldPairs, hashBits = 56)
        .count()
    }
  }

  test("GDPR scrub of band table + pairs equals recompute-from-scratch on survivors") {
    import spark.implicits._
    // corpus with near-dup pairs whose bridge doc gets deleted: (0,1,2) is a
    // chain through doc 1 — deleting 1 must SPLIT the component
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 0 and 2
      (2L, "beta gamma delta epsilon zeta eta iota kappa"),
      (3L, "unrelated content entirely different words here now"),
      (4L, "unrelated content entirely different words here now"), // exact dup of 3
    ).toDF("doc_id", "text")
    val doomed = Seq(1L).toDF("doc")
    val full = Dedup.docShinglesRaw(corpus, "doc_id", "text")
    val sigs = Dedup.minhashSignatures(full)
    val banded = Dedup.bandedTable(sigs)
    val pairs = Dedup.jaccardPairs(full, 0.5,
      candidates = Some(Dedup.lshCandidates(sigs)))
    val (bandedS, pairsS) = Dedup.scrubArtifacts(banded, pairs, doomed)
    // from-scratch artifacts over survivors
    val surv = corpus.where(col("doc_id") =!= 1L)
    val survSh = Dedup.docShinglesRaw(surv, "doc_id", "text")
    val survSigs = Dedup.minhashSignatures(survSh)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(bandedS) == rows(Dedup.bandedTable(survSigs)))
    assert(rows(pairsS) == rows(Dedup.jaccardPairs(survSh, 0.5,
      candidates = Some(Dedup.lshCandidates(survSigs)))))
    // keep-list re-derived from scrubbed pairs: the 0-1-2 component split
    val keep = Dedup.keepListConverged(surv, "doc_id",
        pairsS.select(col("doc_a"), col("doc_b")))
      .as[(Long, Long)].collect().toMap
    assert(keep(0L) == 0L && keep(2L) == 2L, "bridge delete must split the component")
    assert(keep(4L) == 3L)
  }

  test("contamination flags only non-eval docs sharing shingles with the eval set") {
    // eval = doc 0; docs 1 (exact copy) and 2 (near copy) share shingles,
    // docs 3/4 share none; eval doc itself must not be flagged
    val hits = contaminationOf(Set(0L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hits.keySet == Set(1L, 2L))
    assert(hits(1L)._2 == 0L && hits(2L)._2 == 0L) // audit pointer = eval doc 0
    assert(hits(1L)._1 > hits(2L)._1)              // exact copy shares more
  }

  test("contamination plan: eval side broadcast, corpus side never shuffled before the agg") {
    val p = contaminationOf(Set(0L)).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "eval shingle set must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus shingle stream must not shuffle for the join")
  }
}
