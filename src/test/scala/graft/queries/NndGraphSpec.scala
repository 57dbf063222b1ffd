package graft.queries

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Convergence guard for the NN-descent graph build (r9 verdict #1) —
  * GRAPH ACCURACY (fraction of true directed top-m edges present, the
  * Dong et al. convergence metric) on a corpus WITH cluster structure,
  * where the neighbor-of-neighbor invariant has signal. This is the
  * realistic 100 TB embedding corpus; the catalog's direction-random
  * tables are the adversarial floor for NND and carry their own serve
  * bar in AnnRecallSpec. Measured here (n=3200, 16 clusters,
  * cellpop ≈ 112): ring-only round 1 ≈ 0.58, +NoN rounds → 0.95–1.0 at
  * ring coverage well under the cell — the transitivity, not the ring,
  * closes the graph. The blocked build scores 1.0 scanning every
  * same-cell pair (2·cellpop ≈ 224 candidates/node, the N^1.5 path);
  * NND's per-node candidate count stays rounds·(spill·deg + (2m)²) —
  * corpus-size-free modulo the log-N ring window. */
class NndGraphSpec extends SparkSpec {

  private def clustered(nClusters: Int, per: Int) = {
    import spark.implicits._
    val dim = 64
    def h(a: Int, b: Int, c: Int): Double = {
      val x = ((a * 1000003 + b) * 997 + c) * 2654435761L
      ((x % 1000).toDouble / 1000.0 - 0.5) * 1.2
    }
    def center(cl: Int): Array[Double] =
      Array.tabulate(dim)(d => if (d % nClusters == cl) 4.0 else 0.0)
    val rows = for {
      cl <- 0 until nClusters
      i <- 0 until per
    } yield (i.toLong * nClusters + cl,
      center(cl).zipWithIndex.map { case (x, d) => x + h(cl, i, d) })
    rows.toDF("vec_id", "v")
  }

  test("NND graph accuracy converges to the blocked build's on a clustered corpus") {
    val pts = clustered(16, 200).localCheckpoint(true)
    val n = pts.count()
    val m = SimilarityQueries.NswM
    // truth: exact directed top-m of a ~100-node deterministic sample
    val sample = pts.where(col("vec_id") % 31 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("p"))
      .localCheckpoint(true)
    val truth = Similarity.bruteTopK(pts, sample, m)
      .select(col("probe_id").as("src"), col("neighbor_id").as("dst"))
      .localCheckpoint(true)
    val nTruth = truth.count()
    val cells = SimilarityQueries.centroidCount(n)
    val protos = pts.where(col("vec_id") < cells)
      .select(col("vec_id").cast("long").as("cell"), col("v").as("c"))
    val cosC = graft.functions.VectorSql.dotFast(col("v"), col("c")) /
      (graft.functions.VectorSql.norm2Fast(col("v")) *
        graft.functions.VectorSql.norm2Fast(col("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("vcos").desc, col("cell"))
    val spilled = pts.crossJoin(broadcast(protos))
      .select(col("vec_id"), col("v"), col("cell"), cosC.as("vcos"))
      .withColumn("vrn", row_number().over(w))
      .where(col("vrn") <= SimilarityQueries.SpillCells)
      .select(col("vec_id"), col("v"), col("cell")).localCheckpoint(true)
    def acc(edges: org.apache.spark.sql.DataFrame): Double =
      edges.intersect(truth).count().toDouble / nTruth
    val blockedAcc = acc(Similarity.knnGraphEdges(spilled, m))
    // a window one-seventh of the cell: the ring alone cannot close the
    // graph; rounds of NoN must (measured 0.58 ring-only → ≥ 0.95)
    val smallWindow = acc(Similarity.knnGraphEdgesNnd(spilled, pts, m,
      initDeg = 16, rounds = SimilarityQueries.NndRounds))
    val ringOnly = acc(Similarity.knnGraphEdgesNnd(spilled, pts, m,
      initDeg = 16, rounds = 0))
    // the serving configuration (adaptive log-N window)
    val serving = acc(Similarity.knnGraphEdgesNnd(spilled, pts, m,
      SimilarityQueries.nndRingDeg(n), SimilarityQueries.NndRounds))
    info(s"n=$n cellpop≈${2 * n / cells} blocked=$blockedAcc " +
      s"ringOnly(16)=$ringOnly nnd(16)=$smallWindow " +
      s"serving(${SimilarityQueries.nndRingDeg(n)})=$serving")
    assert(blockedAcc >= 0.99, s"blocked build should be near-exact: $blockedAcc")
    assert(ringOnly <= 0.8,
      s"the small ring alone should NOT close the graph: $ringOnly")
    assert(smallWindow >= 0.95,
      s"NoN rounds must close what the ring samples: $smallWindow")
    assert(serving >= 0.95, s"serving config accuracy degraded: $serving")
  }
}
