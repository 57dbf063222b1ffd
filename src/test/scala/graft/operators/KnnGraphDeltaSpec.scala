package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The load-bearing claim of the incremental graph tier: carrying
  * yesterday's DIRECTED top-M edges and re-ranking them against only the
  * delta-touching candidate pairs yields EXACTLY the full-rebuild graph
  * (top-M mergeability over a frozen quantizer). If this drifts, the
  * `ann_nsw_delta` oracle (the full replay) catches the serving symptom;
  * this spec pins the cause at the edge-set level. */
class KnnGraphDeltaSpec extends SparkSpec {

  test("incremental edge set == full rebuild edge set on sf0.01") {
    import spark.implicits._
    val dir = sf("sf0.01")
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = pts.count()
    val cells = graft.queries.SimilarityQueries.centroidCount(n)
    val protos = pts.where(col("vec_id") < cells)
      .select(col("vec_id").cast("long").as("cell"), col("v").as("c"))
    val cosC = graft.functions.VectorSql.dotFast(col("v"), col("c")) /
      (graft.functions.VectorSql.norm2Fast(col("v")) *
        graft.functions.VectorSql.norm2Fast(col("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("vcos").desc, col("cell"))
    val full = pts.crossJoin(broadcast(protos))
      .select(col("vec_id"), col("v"), col("cell"), cosC.as("vcos"))
      .withColumn("vrn", row_number().over(w))
      .where(col("vrn") <= graft.queries.SimilarityQueries.SpillCells)
      .select(col("vec_id"), col("v"), col("cell"))
      .localCheckpoint(eager = true)
    val cut = n - n / 10
    val m = graft.queries.SimilarityQueries.NswM
    val rebuild = Similarity.knnGraphEdges(full, m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oldDirected = Similarity.knnGraphDirected(
      full.where(col("vec_id") < cut), m)
    val incremental = Similarity.knnGraphEdgesIncremental(
        full.where(col("vec_id") < cut), full.where(col("vec_id") >= cut),
        oldDirected, pts, m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incremental == rebuild,
      s"incremental graph drifted from rebuild: " +
        s"only-incremental=${(incremental -- rebuild).take(5)}, " +
        s"only-rebuild=${(rebuild -- incremental).take(5)}")
    // the delta really displaced carried edges somewhere (the merge was
    // load-bearing, not a no-op append)
    val oldSyms = {
      val t = oldDirected.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      t ++ t.map(_.swap)
    }
    assert((oldSyms -- rebuild).nonEmpty,
      "fixture too easy: no old edge was displaced by the delta")
  }

  test("incremental DELETE edge set == rebuild on survivors (frozen quantizer)") {
    import spark.implicits._
    val dir = sf("sf0.01")
    val pts = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = pts.count()
    val cells = graft.queries.SimilarityQueries.centroidCount(n)
    val protos = pts.where(col("vec_id") < cells)
      .select(col("vec_id").cast("long").as("cell"), col("v").as("c"))
    val cosC = graft.functions.VectorSql.dotFast(col("v"), col("c")) /
      (graft.functions.VectorSql.norm2Fast(col("v")) *
        graft.functions.VectorSql.norm2Fast(col("c")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("vcos").desc, col("cell"))
    val full = pts.crossJoin(broadcast(protos))
      .select(col("vec_id"), col("v"), col("cell"), cosC.as("vcos"))
      .withColumn("vrn", row_number().over(w))
      .where(col("vrn") <= graft.queries.SimilarityQueries.SpillCells)
      .select(col("vec_id"), col("v"), col("cell"))
      .localCheckpoint(eager = true)
    val m = graft.queries.SimilarityQueries.NswM
    val mod = graft.queries.SimilarityQueries.NswGdprMod
    val doomed = pts.where(col("vec_id") % mod === 0 && col("vec_id") >= cells)
      .select(col("vec_id"))
    assert(doomed.count() > 0, "fixture must doom at least one vector")
    val survivors = full.join(doomed.withColumnRenamed("vec_id", "did"),
      full("vec_id") === col("did"), "left_anti")
    val rebuild = Similarity.knnGraphEdges(survivors, m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directed = Similarity.knnGraphDirected(full, m)
    val scrubbed = Similarity.knnGraphDeleteIncremental(full, directed, doomed, m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scrubbed == rebuild,
      s"delete drifted from survivor rebuild: " +
        s"only-scrubbed=${(scrubbed -- rebuild).take(5)}, " +
        s"only-rebuild=${(rebuild -- scrubbed).take(5)}")
    // the doomed vectors are really gone from both endpoints
    val doomedIds = doomed.collect().map(_.getLong(0)).toSet
    assert(scrubbed.forall { case (a, b) => !doomedIds(a) && !doomedIds(b) })
    // and at least one src genuinely re-ranked (the slot-refill was
    // load-bearing — naive edge dropping would under-fill it)
    val dirSet = directed.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = {
      val t = dirSet.filter { case (a, b) => !doomedIds(a) && !doomedIds(b) }
      t ++ t.map(_.swap)
    }
    assert((rebuild -- naive).nonEmpty,
      "fixture too easy: no freed top-M slot needed refilling")
  }
}
