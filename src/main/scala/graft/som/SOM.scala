package graft.som

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.linalg.{DenseVector, Vector, Vectors}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** A point with its cached L2 norm, used for triangle-inequality pruning in
  * the BMU search (reference `som/SOM.scala:351-359`). */
private[graft] case class VectorWithNorm(vector: Vector, norm: Double)

private[graft] object Distance {
  /** Squared-distance lower bound from norms: (‖a‖−‖b‖)². Lets the BMU scan
    * skip the O(d) distance for most prototypes (reference
    * `som/SOM.scala:312-316`). */
  @inline def lowerBound(a: VectorWithNorm, b: VectorWithNorm): Double = {
    val diff = a.norm - b.norm
    diff * diff
  }

  /** Argmin over prototypes with min-index tie-break (strict `<`, reference
    * `som/SOM.scala:306-326`). Returns (bmuIndex, squaredDistance). */
  def findClosest(protos: Array[VectorWithNorm], p: VectorWithNorm): (Int, Double) = {
    var best = Double.PositiveInfinity
    var bestIdx = 0
    var k = 0
    while (k < protos.length) {
      val c = protos(k)
      if (lowerBound(c, p) < best) {
        val d = Vectors.sqdist(c.vector, p.vector)
        if (d < best) { best = d; bestIdx = k }
      }
      k += 1
    }
    (bestIdx, best)
  }
}

/** Batch Self-Organizing Map estimator — Kohonen map trained with the
  * k-means-style batch update plus topological neighborhood smoothing
  * (reference `som/SOM.scala`).
  *
  * Spark-first rework of the reference's RDD pipeline:
  *  - the per-iteration assign+aggregate is one DataFrame job:
  *    `groupBy(bmu).agg(Summarizer.sum(features), count, sum(d2))` — Catalyst
  *    performs the map-side partial aggregation the reference hand-rolled
  *    with `mapPartitions` + `reduceByKey` (reference `som/SOM.scala:192-212`);
  *  - the quantization cost rides the same aggregate as an exact column
  *    instead of an at-least-once accumulator (reference `som/SOM.scala:181`);
  *  - the O(K²·d) neighborhood smoothing stays on the driver, exactly like
  *    the reference (`som/SOM.scala:219-234`) — K is always tiny relative to N.
  *
  * Scale: per iteration, one scan of N rows (no shuffle of the data — the
  * shuffle moves only ≤K partial aggregates), one ≤K-row collect. The model
  * (K·d doubles) is broadcast each iteration and destroyed after.
  */
class SOM(override val uid: String) extends Estimator[SOMModel] with SOMParams
    with org.apache.spark.ml.util.DefaultParamsWritable {

  def this() = this(org.apache.spark.ml.util.Identifiable.randomUID("som"))

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)
  def setHeight(v: Int): this.type = set(height, v)
  def setWidth(v: Int): this.type = set(width, v)
  def setTMax(v: Double): this.type = set(tMax, v)
  def setTMin(v: Double): this.type = set(tMin, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setKernel(v: String): this.type = set(kernel, v)
  def setDecay(v: String): this.type = set(decay, v)
  def setTopology(v: String): this.type = set(topology, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setProtoDecimals(v: Int): this.type = set(protoDecimals, v)
  def setSumDecimals(v: Int): this.type = set(sumDecimals, v)

  private var initialModel: Option[SOMModel] = None

  /** Warm-start from an existing model's prototypes (reference
    * `som/SOM.scala:124-131`; fixes its `Int == Param` comparison bug —
    * SURVEY.md §7.3.2 — by comparing param *values*). */
  def setInitialModel(model: SOMModel): this.type = {
    require(model.prototypes.length == numCells,
      s"initial model has ${model.prototypes.length} prototypes, expected $numCells")
    initialModel = Some(model)
    this
  }

  override def fit(dataset: Dataset[_]): SOMModel = {
    transformSchema(dataset.schema, logging = true)
    val spark = dataset.sparkSession
    val sc = spark.sparkContext
    val k = numCells

    // Column pruning + normalization to VectorUDT (Catalyst prunes the scan
    // to the features column), then ONE exit to a cached RDD[VectorWithNorm]
    // for the iterative hot loop. The per-iteration assign+aggregate is a
    // tiny ≤K-row result over an unchanging input: re-planning it through
    // Catalyst every iteration (analysis + whole-stage codegen + exchange)
    // costs more than the aggregation itself — the same reason MLlib's
    // iterative estimators (KMeans, GMM) run their training loops on RDD
    // aggregates. Row decode and norm compute happen once, not per
    // iteration; the aggregation below is still map-side partial + combine,
    // shuffling only K×d partials per partition.
    val fcol = SOMModel.toVectorCol(dataset.schema($(featuresCol)).dataType, col($(featuresCol))).as("f")
    val data = dataset.select(fcol)
    val points = data.rdd.map { r =>
      val v = r.getAs[Vector](0)
      VectorWithNorm(v, Vectors.norm(v, 2.0))
    }
    points.persist(StorageLevel.MEMORY_AND_DISK)

    // --- init: K seeded random rows with the reference's exact seed chain —
    // the takeSample seed is the first nextInt of an XORShift generator
    // seeded by the user seed (`som/SOM.scala:295-298`); warm start takes
    // precedence. (Sampling the mapped RDD preserves partition structure and
    // row order, so the same seed draws the same rows as sampling the
    // DataFrame did.)
    var prototypes: Array[VectorWithNorm] = initialModel match {
      case Some(m) => m.prototypes.map(v => VectorWithNorm(v, Vectors.norm(v, 2.0)))
      case None =>
        val sample = points.takeSample(withReplacement = true, num = k,
          seed = new XORShiftRandom($(seed)).nextInt())
        require(sample.length == k, s"not enough data to sample $k prototypes")
        sample.map(p => VectorWithNorm(Vectors.dense(p.vector.toArray), p.norm))
    }

    val kern = $(kernel); val dec = $(decay); val w = $(width)
    val cellD = Grid.cellDistFor($(topology), w)
    val tMx = $(tMax); val tMn = $(tMin); val iters = $(maxIter); val eps = $(tol)
    val pd = $(protoDecimals); val sd = $(sumDecimals)
    // HALF_UP matches both Spark's round() and DuckDB's round() (away from
    // zero on exact halves) — math.rint would be half-even. Non-finite
    // components pass through unrounded (BigDecimal rejects NaN/Inf) so a
    // poisoned feature row surfaces as a NaN prototype, not a crash.
    def r(scale: Int)(x: Double): Double =
      if (!java.lang.Double.isFinite(x)) x
      else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    def quantize(v: Vector): Vector =
      if (pd < 0) v else Vectors.dense(v.toArray.map(r(pd)))
    val history = scala.collection.mutable.ArrayBuffer.empty[Double]
    var iter = 0
    var converged = false

    val dim0 = prototypes(0).vector.size
    while (iter < iters && !converged) {
      val bc = sc.broadcast(prototypes)
      // One single-stage job per iteration: map-side partial aggregation into
      // a K×d accumulator per partition, combined treewise when K×d is large
      // (same partial+final shape as a hash aggregate, minus the per-
      // iteration plan compile and exchange).
      val partials = points.mapPartitions { it =>
        val a = SOM.CellAgg(k, dim0)
        it.foreach { p =>
          val (cell, d2) = Distance.findClosest(bc.value, p)
          a.add(cell, p.vector, d2)
        }
        Iterator.single(a)
      }
      // Merge partials in PARTITION-INDEX order (collect preserves it): the
      // float sums are then reproducible run-to-run for a fixed partitioning,
      // unlike aggregate/treeAggregate whose driver merge follows task
      // completion order. Driver holds numPartitions×K×d doubles — fine up
      // to ~128 MB; past that, fall back to the tree combine (order
      // nondeterministic in the last ulp; set sumDecimals to quantize it
      // away when cross-run bit-equality matters at that scale).
      val agg =
        if (points.getNumPartitions.toLong * k * dim0 > (1L << 24))
          partials.treeReduce((a, b) => a.merge(b), depth = 2)
        else
          partials.collect().reduceLeft((a, b) => a.merge(b))
      bc.destroy()

      val sums = Array.fill(k)(null: Vector)
      val counts = new Array[Double](k)
      // Quantize the cost with the sums, per the sumDecimals contract: the
      // recorded history/summary stays reproducible across partition counts
      // and treeReduce merge order. (Convergence itself is decided by
      // prototype MOVEMENT below — and the prototypes are already quantized
      // via protoDecimals — so this only stabilizes the reported cost.)
      val totalCost = if (sd < 0) agg.cost else r(sd)(agg.cost)
      var c = 0
      while (c < k) {
        if (agg.counts(c) > 0) {
          // Quantize the order-dependent per-cell sums BEFORE the weighted
          // combine, so the update ratio's inputs are reproducible across
          // engines and partition counts (matches the som_fit5 oracle
          // chain's round(sum(x), sumDecimals)).
          val s = agg.sums(c)
          sums(c) = Vectors.dense(if (sd < 0) s else s.map(r(sd)))
          counts(c) = agg.counts(c).toDouble
        }
        c += 1
      }

      // Driver-side neighborhood smoothing (the one difference from k-means,
      // reference `som/SOM.scala:219-244`): weighted sums over *all* cells.
      val t = Grid.temperature(dec, iter, iters, tMx, tMn)
      val dim = prototypes(0).vector.size
      val next = new Array[VectorWithNorm](k)
      var moved = false
      var cell = 0
      while (cell < k) {
        val acc = new Array[Double](dim)
        var wn = 0.0
        var j = 0
        while (j < k) {
          if (counts(j) > 0) {
            val wgt = Grid.kernelWeight(kern, cellD(cell, j), t)
            if (wgt != 0.0) {
              val sj = sums(j).toArray
              var d = 0
              while (d < dim) { acc(d) += wgt * sj(d); d += 1 }
              wn += wgt * counts(j)
            }
          }
          j += 1
        }
        val nv = quantize(
          if (wn > 0) { var d = 0; while (d < dim) { acc(d) /= wn; d += 1 }; Vectors.dense(acc) }
          else prototypes(cell).vector) // no mass anywhere near: keep
        if (Vectors.sqdist(nv, prototypes(cell).vector) > eps * eps) moved = true
        next(cell) = VectorWithNorm(nv, Vectors.norm(nv, 2.0))
        cell += 1
      }
      prototypes = next
      converged = !moved
      history += totalCost
      iter += 1
    }

    points.unpersist(blocking = false)

    val model = copyValues(new SOMModel(uid, prototypes.map(_.vector)).setParent(this))
    val summary = new SOMTrainingSummary(
      model.transform(dataset), $(featuresCol), $(predictionCol),
      $(height), $(width), $(maxIter), iter,
      if (history.nonEmpty) history.last else 0.0, history.toArray)
    model.setSummary(Some(summary))
    model
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema)

  override def copy(extra: ParamMap): SOM = defaultCopy(extra)
}

/** Params-only persistence for the unfitted estimator, so `Pipeline.save`
  * accepts a pipeline with a SOM stage. */
object SOM extends org.apache.spark.ml.util.DefaultParamsReadable[SOM] {
  override def load(path: String): SOM = super.load(path)

  /** Mutable per-partition accumulator for one training iteration: per-cell
    * component sums + counts + total quantization cost. The `sums` rows are
    * allocated lazily so an iteration over a partition that hits few cells
    * never materializes K×d zeros. */
  private[som] final case class CellAgg(k: Int, dim: Int) {
    val sums: Array[Array[Double]] = new Array[Array[Double]](k)
    val counts: Array[Long] = new Array[Long](k)
    var cost: Double = 0.0

    def add(cell: Int, v: Vector, d2: Double): this.type = {
      if (sums(cell) == null) sums(cell) = new Array[Double](dim)
      val row = sums(cell)
      v.foreachActive((i, x) => row(i) += x)
      counts(cell) += 1
      cost += d2
      this
    }

    def merge(o: CellAgg): this.type = {
      var c = 0
      while (c < k) {
        if (o.sums(c) != null) {
          if (sums(c) == null) sums(c) = o.sums(c)
          else {
            val a = sums(c); val b = o.sums(c)
            var i = 0
            while (i < dim) { a(i) += b(i); i += 1 }
          }
          counts(c) += o.counts(c)
        }
        c += 1
      }
      cost += o.cost
      this
    }
  }
}
