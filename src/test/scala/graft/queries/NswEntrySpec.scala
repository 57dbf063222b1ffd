package graft.queries

import graft.SparkSpec
import graft.operators.{Kmeans, Similarity}
import org.apache.spark.sql.functions._

/** Entry-point QUALITY for the graph-ANN walk (r9 verdict #3): the beam
  * walk can only find what its entry nodes can reach, so on a clustered
  * corpus — where the kNN graph decomposes into per-cluster components —
  * row-order entries (the r8 lowest-ids heuristic) strand every probe in
  * the leading rows' cluster, while spherical-maximin entries (what the
  * serving entries now derive) cover the direction regions by
  * construction. This spec plants exactly that corpus: 4 direction
  * clusters with disjoint support (cross-cluster cos ≈ 0 → the exact
  * kNN graph is 4 disconnected components), the first quarter of row ids
  * all in cluster 0.
  */
class NswEntrySpec extends SparkSpec {

  private val Dim = 64
  private val PerCluster = 50

  /** Deterministic jitter (hash-derived, no RNG state) — the KmeansSpec
    * generator shape on 4 clusters. */
  private def clustered4() = {
    import spark.implicits._
    def h(a: Int, b: Int, c: Int): Double = {
      val x = ((a * 1000003 + b) * 997 + c) * 2654435761L
      ((x % 1000).toDouble / 1000.0 - 0.5) * 0.2
    }
    def center(cl: Int): Array[Double] =
      Array.tabulate(Dim)(d => if (d % 4 == cl) 5.0 else 0.0)
    val rows = for {
      cl <- 0 until 4
      i <- 0 until PerCluster
    } yield (cl.toLong * PerCluster + i,
      center(cl).zipWithIndex.map { case (x, d) => x + h(cl, i, d) })
    rows.toDF("vec_id", "v")
  }

  private def cluster(id: Long): Long = id / PerCluster

  test("maximin entries cover the clusters row-order entries strand") {
    import spark.implicits._
    val pts = clustered4().localCheckpoint(true)
    // the EXACT kNN graph (single-cell candidates — build quality is not
    // under test here, entry quality is): 4 disconnected components
    val edges = Similarity.knnGraphEdges(
      pts.withColumn("cell", lit(0L)), m = 8).localCheckpoint(true)
    val crossCluster = edges
      .where((col("src") / PerCluster).cast("long") =!=
        (col("dst") / PerCluster).cast("long")).count()
    assert(crossCluster == 0, s"graph should be 4 components, " +
      s"found $crossCluster cross-cluster edges")

    // one probe per cluster, none of them an entry candidate's row 0
    val probeIds = Seq(7L, 57L, 107L, 157L)
    val probes = pts.where(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("v").as("p"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => r.getLong(r.fieldIndex("probe_id")) ->
        r.getLong(r.fieldIndex("neighbor_id")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.bruteTopK(pts, probes, 10))

    def meanRecall(entryIds: Seq[Long]): Double = {
      val got = topSets(Similarity.nswTopK(edges, pts, probes,
        entryIds.toDF("vec_id"),
        k = 10, beam = SimilarityQueries.NswBeam,
        steps = SimilarityQueries.NswSteps))
      val r = exact.map { case (p, t) =>
        got.getOrElse(p, Set.empty).intersect(t).size.toDouble / t.size }
      r.sum / r.size
    }

    // the r8 heuristic: lowest 4 ids — ALL in cluster 0
    val fixedRecall = meanRecall(Seq(0L, 1L, 2L, 3L))
    // the serving derivation: spherical maximin — one per cluster
    val seeds = Kmeans.maximinSeeds(pts, SimilarityQueries.NswEntries,
      spherical = true)
    info(s"maximin seeds ${seeds.toSeq} in clusters ${seeds.map(cluster).toSeq}")
    assert(seeds.map(cluster).toSet.size == 4,
      s"maximin must land one entry per cluster, got ${seeds.toSeq}")
    val maximinRecall = meanRecall(seeds.toSeq)
    info(s"recall@10 — row-order entries $fixedRecall, maximin $maximinRecall")
    // 3 of 4 probes are unreachable from cluster-0 entries
    assert(fixedRecall <= 0.5,
      s"row-order entries should strand off-cluster probes: $fixedRecall")
    assert(maximinRecall >= 0.95,
      s"maximin entries must reach every cluster: $maximinRecall")
  }
}
