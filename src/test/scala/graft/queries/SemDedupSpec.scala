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
}
