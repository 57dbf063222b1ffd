package graft.queries

import graft.SparkSpec

/** retrieval_rrf: per-query structural invariants — the fusion math itself
  * is held by the cross-engine oracle at every SF. */
class RetrievalRrfSpec extends SparkSpec {

  test("every probe gets a contiguous, score-nonincreasing top list; never itself") {
    import spark.implicits._
    val out = SimilarityQueries.retrievalRrf(spark, sf("sf0.001"))
      .as[(Long, Int, Long, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == (0L until SimilarityQueries.NumProbes).toSet)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"probe $q: ranks not contiguous")
      assert(rows.length <= SimilarityQueries.RrfOutK)
      assert(sorted.sliding(2).forall(p => p.head._4 >= p.last._4),
        s"probe $q: rrf scores must be nonincreasing in rank")
      assert(!rows.exists(_._3 == q), s"probe $q retrieved itself")
      // a fused head must out-score any single-list tail: rank-1 beats the
      // floor a single list can contribute at the output cut
      assert(sorted.head._4 >= SimilarityQueries.RrfScale /
        (SimilarityQueries.RrfC + 1), s"probe $q: head score below single-list rank-1 floor")
    }
  }
}
