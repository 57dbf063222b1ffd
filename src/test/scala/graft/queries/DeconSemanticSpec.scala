package graft.queries

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** dedup_contamination_semantic: the paraphrase-catch property (vector-near,
  * n-gram-disjoint contamination that ONLY the embedding pass finds) and a
  * quantization-sanity band check on the real corpus. */
class DeconSemanticSpec extends SparkSpec {

  test("paraphrased eval dup (zero shared n-grams) is caught; the n-gram pass misses it") {
    import spark.implicits._
    def vec(parts: (Int, Double)*): Array[Double] = {
      val a = new Array[Double](64); parts.foreach { case (i, x) => a(i) = x }; a
    }
    // eval item 0; corpus 10 is its PARAPHRASE (same meaning → near-parallel
    // embedding, cos ≈ 0.995), corpus 11 an unrelated clean doc (orthogonal)
    val evalV = Seq((0L, vec(0 -> 1.0, 1 -> 0.05))).toDF("vec_id", "v")
    val corpusV = Seq(
      (10L, vec(0 -> 0.9, 1 -> 0.1)),
      (11L, vec(2 -> 1.0))).toDF("vec_id", "v")
    val flagged = SimilarityQueries.contaminationSemanticCore(corpusV, evalV)
      .select(col("vec_id")).as[Long].collect().toSet
    assert(flagged == Set(10L),
      s"the paraphrase (and only it) must be flagged, got $flagged")

    // the same pair as TEXT shares not a single 3-gram — verbatim-overlap
    // decontamination (dedup_contamination's machinery) sees nothing
    val evalT = Seq((0L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val corpusT = Seq(
      (10L, "a speedy auburn vulpine leaps above an idle hound"),
      (11L, "entirely different clean training material here"))
      .toDF("doc_id", "text")
    val ngramHits = Dedup.contamination(
      Dedup.docShinglesRaw(corpusT, "doc_id", "text"),
      Dedup.docShinglesRaw(evalT, "doc_id", "text")).count()
    assert(ngramHits == 0, "no shared 3-gram: the verbatim pass must miss it")
  }

  test("real corpus: flagged set matches the scaled-space cosine threshold up to int8 rounding") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val flagged = SimilarityQueries.contaminationSemantic(spark, dir)
      .select(col("vec_id"), col("eval_id")).as[(Long, Long)].collect().toSet
    assert(flagged.nonEmpty, "corpus must yield real contamination hits")
    // The lattice divides each dim by its max-abs, so the threshold lives in
    // THAT space: compare against the cosine of the scaled (pre-rounding)
    // vectors; only int8 rounding separates the two, a narrow band.
    val p = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val scales = p.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(max(abs(col("x"))).as("s"))
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    val sArr = array(scales.map(lit(_)): _*)
    def scaled(c: org.apache.spark.sql.Column) =
      zip_with(c, sArr, (x, sc) => when(sc === 0.0, lit(0.0)).otherwise(x / sc))
    val ps = p.select(col("vec_id"), scaled(col("v")).as("u"))
    val ev = ps.where(col("vec_id") % SimilarityQueries.SemDeconEvalMod === 0)
      .select(col("vec_id").as("eval_id"), col("u").as("e"))
    val cos = ps.where(col("vec_id") % SimilarityQueries.SemDeconEvalMod =!= 0)
      .crossJoin(broadcast(ev))
      .select(col("vec_id"), col("eval_id"),
        (aggregate(zip_with(col("u"), col("e"), _ * _), lit(0.0), _ + _) /
          (sqrt(aggregate(transform(col("u"), x => x * x), lit(0.0), _ + _)) *
           sqrt(aggregate(transform(col("e"), x => x * x), lit(0.0), _ + _)))).as("c"))
      .as[(Long, Long, Double)].collect()
    cos.foreach { case (v, e, c) =>
      val in = flagged((v, e))
      // int8 rounding can flip only pairs in a narrow band around 0.3
      if (c >= 0.32) assert(in, s"pair ($v,$e) scaled-cos=$c must be flagged")
      if (c <= 0.28) assert(!in, s"pair ($v,$e) scaled-cos=$c must not be flagged")
    }
  }
}
