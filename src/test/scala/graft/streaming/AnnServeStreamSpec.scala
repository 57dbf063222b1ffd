package graft.streaming

import graft.SparkSpec
import graft.queries.SimilarityQueries
import java.nio.file.Files

/** Continuous ANN serving (ann_serve_stream): probe stream served per
  * micro-batch against the static IVF layout. The oracle gate proves the
  * result equals the batch serve; this spec pins the STREAMING claims the
  * oracle can't see — the run really crosses micro-batch boundaries, and
  * the per-batch sink is idempotent under re-execution. */
class AnnServeStreamSpec extends SparkSpec {

  test("stream serve == batch ann_ivf, across MULTIPLE real micro-batches") {
    val dir = sf("sf0.001")
    val streamed = SimilarityQueries.annServeStream(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = SimilarityQueries.annIvf(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, "stream hop changed a neighbor")
    // the probe traffic was split across files with maxFilesPerTrigger=1 —
    // the checkpoint must show the run actually took >1 micro-batch (an
    // all-in-one-batch run would not exercise the batch-boundary claim)
    val offsets = SimilarityQueries.annServeStreamRoot.resolve("ckpt/offsets")
    assert(Files.exists(offsets), s"no checkpoint offsets at $offsets")
    val batches = Files.list(offsets).count()
    assert(batches > 1, s"expected multiple micro-batches, saw $batches")
  }

  test("composed lifecycle (ann_serve_stream_live): streamed probes against the stream-maintained index == batch ann_ivf; both streams multi-batch") {
    val dir = sf("sf0.001")
    graft.operators.Artifacts.clear()
    val live = SimilarityQueries.annServeStreamLive(spark, dir)
      .collect().map(_.toSeq).toSet
    val batch = SimilarityQueries.annIvf(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(live == batch, "the composed lifecycle changed a neighbor")
    val root = SimilarityQueries.annServeStreamLiveRoot
    for (ck <- Seq("index/ckpt/offsets", "serve/ckpt/offsets")) {
      val offsets = root.resolve(ck)
      assert(Files.exists(offsets), s"no checkpoint offsets at $offsets")
      assert(Files.list(offsets).count() > 1,
        s"$ck: expected multiple micro-batches")
    }
  }

  test("per-batch sink is idempotent: re-writing a batch directory leaves one copy") {
    val dir = sf("sf0.001")
    val first = SimilarityQueries.annServeStream(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toVector
    // simulate a restart replaying the LAST batch: re-run the whole entry
    // (fresh checkpoint, same batch split) — every batch directory is
    // overwritten in place, so row counts cannot double
    val second = SimilarityQueries.annServeStream(spark, dir)
      .collect().map(_.toSeq).sortBy(_.toString).toVector
    assert(first == second, "batch replay duplicated or changed rows")
  }
}
