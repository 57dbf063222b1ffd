package graft.queries

import graft.SparkSpec
import graft.operators.{Kmeans, Similarity}
import org.apache.spark.sql.functions._

/** Two-layer graph serve (`ann_nsw_hier`, r9 verdict #6): the coarse
  * centroid layer must buy its keep — recall at the flat walk's bar
  * while SCORING fewer rows (coarse scan + short walk < long flat walk).
  * Scored rows are the serve cost: every (probe, node) cosine the walk
  * evaluates, plus the coarse layer's probe×proto scan for the hier
  * path. */
class NswHierSpec extends SparkSpec {

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().map(r => r.getLong(r.fieldIndex("probe_id")) ->
      r.getLong(r.fieldIndex("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("ann_nsw_hier recall@10 vs ann_brute is >= 0.95 on sf0.01") {
    val dir = sf("sf0.01")
    val exact = topSets(SimilarityQueries.annBrute(spark, dir))
    val hier = topSets(SimilarityQueries.annNswHier(spark, dir))
    assert(exact.keySet == hier.keySet)
    val recalls = exact.map { case (p, t) =>
      p -> hier(p).intersect(t).size.toDouble / t.size }
    val mean = recalls.values.sum / recalls.size
    info(s"ann_nsw_hier recall@10: $mean ($recalls)")
    assert(mean >= 0.95, s"two-layer serve recall degraded: $mean ($recalls)")
    assert(recalls.values.forall(_ >= 0.8), s"a probe collapsed: $recalls")
  }

  test("at x10 data the two-layer walk scores fewer rows at the same recall bar") {
    import spark.implicits._
    val dir = sf("sf0.1")
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val n = pts.count()
    val probes = pts.where(col("vec_id") < SimilarityQueries.NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p"))
    val exact = topSets(Similarity.bruteTopK(pts, probes, 10))
    val edges = Similarity.knnGraphEdges(
      SimilarityQueries.spilledSqrtN(spark, dir), SimilarityQueries.NswM)
      .localCheckpoint(true)
    def recallOf(visited: org.apache.spark.sql.DataFrame): Double = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
      val got = topSets(visited.where(col("vec_id") =!= col("probe_id"))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
        .select(col("probe_id"), col("vec_id").as("neighbor_id")))
      val r = exact.map { case (p, t) =>
        got.getOrElse(p, Set.empty).intersect(t).size.toDouble / t.size }
      r.sum / r.size
    }
    // FLAT: maximin entries for every probe, NswSteps rounds
    val flatPairs = probes.select(col("probe_id")).crossJoin(
      Kmeans.maximinSeeds(pts, SimilarityQueries.NswEntries, spherical = true)
        .toSeq.toDF("vec_id"))
    val flatVisited = Similarity.nswWalkVisited(edges, pts, probes, flatPairs,
      SimilarityQueries.NswBeam, SimilarityQueries.NswSteps)
      .localCheckpoint(true)
    // HIER: per-probe coarse-layer entries, NswHierSteps rounds; its serve
    // cost additionally pays the coarse probe×proto scan
    val hierPairs = SimilarityQueries.hierEntryPairs(spark, dir)
    val hierVisited = Similarity.nswWalkVisited(edges, pts, probes, hierPairs,
      SimilarityQueries.NswHierBeam, SimilarityQueries.NswHierSteps)
      .localCheckpoint(true)
    val coarseScan = SimilarityQueries.NumProbes.toLong *
      SimilarityQueries.centroidCount(n)
    val (flatScored, hierScored) =
      (flatVisited.count(), coarseScan + hierVisited.count())
    val (flatRecall, hierRecall) = (recallOf(flatVisited), recallOf(hierVisited))
    info(s"flat: scored=$flatScored recall=$flatRecall; " +
      s"hier: scored=$hierScored (incl. $coarseScan coarse) recall=$hierRecall")
    assert(hierRecall >= 0.95, s"two-layer recall at x10: $hierRecall")
    assert(hierRecall >= flatRecall - 1e-9,
      s"two-layer serve must not lose to flat: $hierRecall vs $flatRecall")
    assert(hierScored < flatScored,
      s"two-layer serve must score fewer rows: $hierScored vs $flatScored")
  }
}
