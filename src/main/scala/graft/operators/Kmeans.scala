package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorSql._

/** Trained Lloyd k-means coarse quantizer for the IVF serving family.
  *
  * The alternative to the data-sampled heuristic (first-K corpus rows as
  * centroids) the `ann_ivf*` entries serve from: K-means assigns vectors
  * to cells that reflect the corpus DISTRIBUTION, so cell populations
  * balance and — when the corpus HAS cluster structure — a probe's
  * `nprobe` cells capture more true neighbors per scanned row. (On the
  * catalog's direction-random embeddings the measurement said the serving
  * entries should stay heuristic; the numbers and the clustered
  * counter-case live on [[graft.queries.SimilarityQueries]]'s
  * `kmCentroids` note and in KmeansSpec.) The reference's
  * iterative-refinement shape is its SOM training loop (reference
  * `som/SOM.scala:192-244`); Lloyd is the degenerate neighborhood-of-one
  * case, so the whole oracle discipline of `som_fit5` transfers verbatim:
  *
  *  - deterministic warm start: the first `k` corpus rows (by id),
  *    4-decimal-quantized — no sampling anywhere;
  *  - every iterate is QUANTIZED (component sums rounded to 6 decimals,
  *    means to 4) so a DuckDB CTE chain replays the whole fit
  *    hash-identically — the fit itself sits under the oracle gate, not
  *    just the serving that consumes it;
  *  - assignment metric is either squared euclidean (classic IVF) or
  *    cosine (SPHERICAL k-means — the correct quantizer for a cosine
  *    serving metric; see the measured straggler analysis on
  *    [[Similarity.ivfTopKSpill]]).
  *
  * Scale shape (100 TB stance): per iteration ONE corpus scan — broadcast
  * K-row centroid table, map-side `min(struct(metric, cell))` argmin that
  * collapses the K·N join rows to N before any exchange, then a K-row
  * vector-sum aggregate (`Summarizer.sum`, partials combine map-side).
  * The driver holds only K×d doubles between iterations (the SOM-fit
  * discipline); nothing data-scale is ever collected. Iteration count is
  * fixed and small — a coarse quantizer needs balance, not convergence.
  */
object Kmeans {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Deterministic MAXIMIN (Gonzalez farthest-point) seeding — the
    * k-means++ job without its RNG: seed 0 is the minimum-id row; each
    * next seed is the point FARTHEST from the chosen set (max over points
    * of min over seeds of the metric; min-id tie-break). Immune to the
    * first-K failure mode where corpus order puts every seed inside one
    * cluster (KmeansSpec plants exactly that corpus), and fully
    * oracle-replayable — distances are the shared left-to-right folds,
    * the selection is an exact min/argmax. k-1 bounded scans, each a
    * broadcast of ≤k seed rows; a 100 TB run seeds from a sample the same
    * way. Returns seed row ids IN SELECTION ORDER (= cell numbering). */
  def maximinSeeds(points: DataFrame, k: Int, spherical: Boolean): Array[Long] = {
    val first = points.select(min(col("vec_id"))).head().getLong(0)
    val ids = scala.collection.mutable.ArrayBuffer(first)
    while (ids.length < k) {
      val spark = points.sparkSession
      import spark.implicits._
      val seeds = points.where(col("vec_id").isin(ids.toSeq: _*))
        .select(col("v").as("sv"))
      // per point: worst-case proximity to the chosen set; farthest wins
      val prox =
        if (spherical) max(dotFast(col("v"), col("sv"))
          / (norm2Fast(col("v")) * norm2Fast(col("sv"))))
        else min(sqDistFast(col("v"), col("sv")))
      // already-chosen seeds are excluded from the candidate set: on a
      // degenerate corpus where every remaining point ties at the
      // worst-case proximity (exact-duplicate vectors), the min-id
      // tie-break could otherwise re-select a seed and emit duplicate
      // centroids. The oracle's kmd CTE carries the same NOT IN.
      val next = points.where(!col("vec_id").isin(ids.toSeq: _*))
        .crossJoin(broadcast(seeds))
        .groupBy(col("vec_id")).agg(prox.as("prox"))
        .orderBy(if (spherical) col("prox").asc else col("prox").desc,
          col("vec_id").asc)
        .limit(1).head().getLong(0)
      ids += next
    }
    ids.toArray
  }

  /** [[maximinSeeds]] over a DETERMINISTIC HASH-SAMPLE of the corpus —
    * the 100 TB seeding path the full-corpus variant's scaladoc promises
    * (r9 verdict #4): each of the k−1 selection scans reads only the
    * `ratePpm`-per-million sample (the `ml_weighted_sample` md5 keep-rule,
    * salt `"mx:"`), so seeding cost is k·sample-sized instead of
    * k·corpus-sized while the seeds stay actual corpus rows, deterministic,
    * and oracle-replayable (the sample predicate is one portable md5
    * expression — `km_fit_sampled` replays filter + seeding + Lloyd).
    * Spread degrades gracefully: maximin over a uniform sample still
    * separates direction regions whenever each region keeps ≥1 sampled row
    * (KmeansSpec asserts cluster coverage at 50% sampling, and identity
    * with the full-corpus seeds at ratePpm = 1e6, where the predicate
    * keeps everything). */
  def maximinSeedsSampled(points: DataFrame, k: Int, spherical: Boolean,
                          ratePpm: Long): Array[Long] = {
    // rate 1e6 keeps every row, so the sampling machinery (per-row md5
    // filter, eager corpus-sized checkpoint, count) would be pure
    // overhead for an identical result — take the full-corpus path the
    // seeds are defined to equal (KmeansSpec pins the identity). This is
    // km_fit's default path; the r10→r11 bench adjudication measured the
    // machinery at ~2 extra jobs per fit.
    if (ratePpm >= 1000000L) return maximinSeeds(points, k, spherical)
    // materialize the sample ONCE: the k−1 selection scans otherwise each
    // re-read the source and re-evaluate the md5 keep-rule. The sample is
    // bounded by design (a 100 TB run passes a ppm-scale rate), so the
    // checkpoint is seed-pool-sized, never corpus-sized.
    val sample = seedSample(points, ratePpm)
      .select(col("vec_id"), col("v")).localCheckpoint(eager = true)
    // guard the degenerate pool (low ratePpm × small corpus): without it,
    // maximinSeeds' seed-excluding argmax runs out of candidates and dies
    // in an opaque empty-head. The count is free on the checkpoint.
    val n = sample.count()
    require(n >= k,
      s"seed sample has $n rows but k=$k seeds were requested — " +
        s"raise ratePpm ($ratePpm/1e6 keep rate) or seed from the full corpus")
    maximinSeeds(sample, k, spherical)
  }

  /** The shared keep-rule: md5-derived per-id uniform in [0, 1e6). */
  def seedSample(points: DataFrame, ratePpm: Long): DataFrame =
    points.where(graft.functions.VectorSql.md5Hash60(
      concat(lit("mx:"), col("vec_id").cast("string"))) % 1000000L < ratePpm)

  /** Fixed-iteration Lloyd fit. `points`: (vec_id, v: array<double>).
    * Initial centroids = the [[maximinSeeds]] rows (or rows vec_id < k
    * when `firstKSeeds` — the data-sampled heuristic, kept for controlled
    * comparison and for corpora where ingest order is known-shuffled),
    * r4-quantized. Returns k × d centroid components in cell order. An
    * iteration that empties a cell carries the cell's previous centroid
    * forward (no respawn heuristics — deterministic and oracle-replayable
    * as a LEFT JOIN + COALESCE). */
  def fitLloyd(points: DataFrame, k: Int, iters: Int, spherical: Boolean,
               firstKSeeds: Boolean = false,
               seedRatePpm: Long = 1000000L): Array[Array[Double]] = {
    val spark = points.sparkSession
    import spark.implicits._
    var protos: Array[Array[Double]] =
      if (firstKSeeds)
        points.where(col("vec_id") < k).orderBy("vec_id").collect()
          .map(_.getAs[Seq[Double]]("v").toArray.map(r4))
      else {
        val seedIds = maximinSeedsSampled(points, k, spherical, seedRatePpm)
        val byId = points.where(col("vec_id").isin(seedIds.toSeq: _*)).collect()
          .map(r => r.getLong(0) -> r.getAs[Seq[Double]]("v").toArray.map(r4)).toMap
        seedIds.map(byId)
      }
    require(protos.length == k, s"need $k seed rows, got ${protos.length}")
    for (_ <- 0 until iters) {
      val protoDF = protos.zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("cell", "c")
      // negated cosine so both metrics take the same ascending
      // min(struct(m, cell)) — identical ordering to the oracle's
      // `ORDER BY cos DESC, cell` (strictly monotone negation)
      val m =
        if (spherical) -(dotFast(col("v"), col("c"))
          / (norm2Fast(col("v")) * norm2Fast(col("c"))))
        else sqDistFast(col("v"), col("c"))
      val assign = points.crossJoin(broadcast(protoDF))
        .select(col("vec_id"), col("v"), m.as("m"), col("cell"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("m"), col("cell"))).as("mm"), first(col("v")).as("v"))
        .select(col("mm.cell").as("cell"), col("v"))
      // the som_fit5 vector-shaped aggregate: N in-place vector adds, K-row
      // shuffle, K×d explode AFTER the agg; round(·,6) pins the
      // order-dependent component sums cross-engine, round(·,4) the mean
      val sums = assign
        .select(col("cell"),
          org.apache.spark.ml.functions.array_to_vector(col("v")).as("fv"))
        .groupBy(col("cell"))
        .agg(org.apache.spark.ml.stat.Summarizer.sum(col("fv")).as("sv"),
          count(lit(1)).as("n"))
        .select(col("cell"), col("n"),
          posexplode(org.apache.spark.ml.functions.vector_to_array(col("sv")))
            .as(Seq("dim", "x")))
        .select(col("cell"), col("dim"),
          round(round(col("x"), 6) / col("n"), 4).as("nv"))
        .collect()
      val next = protos.map(_.clone()) // empty-cell carryover
      sums.foreach(r => next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2))
      protos = next
    }
    protos
  }

  /** The fitted quantizer as a (cell: long, c: array<double>) DataFrame —
    * the shape [[Similarity.ivfTopK]]/[[Similarity.ivfTopKSpill]] broadcast.
    * Shared through [[Artifacts]] so the five serving entries that consume
    * one quantizer pay the fit once per session (production trains once and
    * publishes the centroid table; this is that boundary). */
  def centroids(spark: SparkSession, points: => DataFrame, k: Int, iters: Int,
                spherical: Boolean, shareKey: String,
                seedRatePpm: Long = 1000000L): DataFrame =
    Artifacts.shared(s"kmeans:$shareKey:$k:$iters:$spherical:$seedRatePpm") {
      import spark.implicits._
      fitLloyd(points, k, iters, spherical, firstKSeeds = false,
        seedRatePpm = seedRatePpm).zipWithIndex
        .map { case (c, i) => (i.toLong, c) }.toSeq.toDF("cell", "c")
    }
}
