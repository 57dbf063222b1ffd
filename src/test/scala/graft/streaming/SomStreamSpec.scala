package graft.streaming

import graft.SparkSpec

/** Online SOM training (som_fit_stream): the stream must genuinely apply
  * one update per arriving slice (one micro-batch each), produce a model
  * DIFFERENT from the full-corpus batch fit (the mini-batch schedule is
  * real, not an accidental whole-corpus replay), and be deterministic
  * across runs (ordered staging + quantized iterates). */
class SomStreamSpec extends SparkSpec {

  test("one micro-batch per slice; model differs from batch fit; runs deterministic") {
    val dir = sf("sf0.001")
    val m1 = graft.queries.MlQueries.somFitStream(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    val offsets = graft.queries.StreamScratch.path("somfit").resolve("ckpt/offsets")
    assert(java.nio.file.Files.exists(offsets), s"no offsets at $offsets")
    val nBatches = java.nio.file.Files.list(offsets)
      .filter(p => p.getFileName.toString.forall(_.isDigit)).count()
    assert(nBatches >= graft.queries.MlQueries.FitIters,
      s"expected >= ${graft.queries.MlQueries.FitIters} micro-batches, got $nBatches")

    val batch = graft.queries.MlQueries.somFit5(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m1.keySet == batch.keySet && m1 != batch,
      "mini-batch schedule must move the model away from the full-corpus fit")

    val m2 = graft.queries.MlQueries.somFitStream(spark, dir)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(m1 == m2, "online fit must be deterministic across runs")
  }

  test("composed serve: streamed scoring crosses batches and covers every point") {
    val dir = sf("sf0.001")
    val served = graft.queries.MlQueries.somPredictStream(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val n = spark.read.parquet(dir + "/embeddings.parquet").count()
    assert(served.size == n, s"every point must be scored: ${served.size} of $n")
    assert(served.values.toSet.subsetOf((0 until 9).toSet))
    val offsets = graft.queries.StreamScratch.path("sompredict").resolve("ckpt/offsets")
    assert(java.nio.file.Files.list(offsets).count() > 1,
      "expected multiple scoring micro-batches")
  }
}
