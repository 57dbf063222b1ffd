package graft.queries

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** dedup_semantic (SemDeDup): group invariants on the real corpus and the
  * within-cell pair graph on a hand corpus with planted near-identical
  * vectors. */
class SemDedupSpec extends SparkSpec {

  test("planted near-identical vectors pair up; cross-cell pairs never form") {
    import spark.implicits._
    // cell 0: vectors 10/11 nearly parallel (cos ≈ 1), 12 orthogonal;
    // cell 1: vector 20 parallel to 10 but BLOCKED by the cell boundary
    def vec(x: Double, y: Double) = Array.tabulate(64) {
      case 0 => x; case 1 => y; case _ => 0.0
    }
    val assigned = Seq(
      (10L, vec(1.0, 0.0), 0L), (11L, vec(0.999, 0.01), 0L),
      (12L, vec(0.0, 1.0), 0L), (20L, vec(1.0, 0.001), 1L)
    ).toDF("vec_id", "v", "cell")
    val pairs = Similarity.semanticPairs(assigned, minCos = 0.9)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((10L, 11L)),
      s"expected exactly the planted within-cell pair, got $pairs")
  }

  test("real corpus: exactly one keeper per group, canonical = min id, multi-member groups exist") {
    import spark.implicits._
    val out = SimilarityQueries.dedupSemantic(spark, sf("sf0.001"))
      .as[(Long, Long, Boolean)].collect()
    val n = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet").count()
    assert(out.length == n && out.map(_._1).distinct.length == n,
      "every vector appears exactly once")
    val groups = out.groupBy(_._2)
    groups.foreach { case (canon, members) =>
      assert(members.count(_._3) == 1, s"group $canon must keep exactly one")
      assert(members.map(_._1).min == canon, s"canonical must be the min member id")
    }
    assert(groups.exists(_._2.length > 1), "corpus must yield multi-member groups")
    assert(out.exists(!_._3), "some vectors must be dropped")
  }

  test("LSH variant: same group invariants; edge set within the cell-blocked variant's") {
    import spark.implicits._
    val out = SimilarityQueries.dedupSemanticLsh(spark, sf("sf0.001"))
      .as[(Long, Long, Boolean)].collect()
    val n = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet").count()
    assert(out.length == n && out.map(_._1).distinct.length == n)
    val groups = out.groupBy(_._2)
    groups.foreach { case (canon, members) =>
      assert(members.count(_._3) == 1, s"group $canon must keep exactly one")
      assert(members.map(_._1).min == canon)
    }
    assert(groups.exists(_._2.length > 1), "LSH must recover multi-member groups")
    // vs the cell-blocked baseline the LSH edge set differs in BOTH honest
    // directions: band recall loss FRAGMENTS groups (extra singletons), and
    // cross-cell pairs the cell boundary forbids by construction MERGE them
    // — but every merge must be witnessed by a confirmed exact-cosine pair
    // crossing the baseline groups (never a hash accident: lshNearDupPairs
    // confirms cos ≥ τ before any pair exists).
    val baseline = SimilarityQueries.dedupSemantic(spark, sf("sf0.001"))
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    val p = SomQueries.points(spark, sf("sf0.001"))
    val bpb = graft.operators.Similarity.bitsPerBand(p.count())
    val confirmed = graft.operators.Similarity
      .lshNearDupPairs(p, SimilarityQueries.SemTau, nBits = 8 * bpb, bands = 8)
      .as[(Long, Long, Double)].collect()
    assert(confirmed.forall(_._3 >= SimilarityQueries.SemTau - 1e-6))
    val straddlers = out.groupBy(_._2).values.filter(ms =>
      ms.map(m => baseline(m._1)).distinct.length > 1)
    straddlers.foreach { ms =>
      val ids = ms.map(_._1).toSet
      val witness = confirmed.exists(pr => ids(pr._1) && ids(pr._2) &&
        baseline(pr._1) != baseline(pr._2))
      assert(witness,
        s"straddling LSH group ${ids.toSeq.sorted} lacks a cross-group confirmed pair")
    }
  }
}
