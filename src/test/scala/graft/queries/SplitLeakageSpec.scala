package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The leakage property `ml_split_leakfree` exists for: a confirmed
  * near-dup pair must NEVER straddle train/test. The naive doc-id-keyed
  * split (the `ml_train_test_split` convention) sends the two ends of a
  * pair to different splits with probability 2·0.8·0.2 = 32% — test-set
  * contamination by construction — and this spec proves it actually
  * happens on the fixture corpus, while the cluster-keyed split has zero
  * straddling pairs on the same data. */
class SplitLeakageSpec extends SparkSpec {

  test("cluster-keyed split never straddles a confirmed pair; doc-id split does") {
    val dir = sf("sf0.001")
    val split = TextDedupQueries.queries("ml_split_leakfree")(spark, dir).cache()
    val pairs = TextDedupQueries.queries("dedup_minhash_pairs")(spark, dir)
      .select(col("doc_a"), col("doc_b")).cache()
    assert(pairs.count() > 0, "fixture corpus must contain confirmed near-dup pairs")

    def straddles(assign: DataFrame): Long = {
      val a = assign.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
      val b = assign.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
      pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(col("split_a") =!= col("split_b")).count()
    }

    assert(straddles(split) === 0L,
      "a near-dup pair straddled train/test under the cluster-keyed split")

    // The naive convention on the same corpus: same salted-hash 80/20, but
    // keyed on the raw doc id instead of the cluster canonical.
    import graft.functions.VectorSql.md5Hash60
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(md5Hash60(concat(lit("split:"), col("doc_id").cast("string"))) % 100 < 80,
          "train").otherwise("test").as("split"))
    assert(straddles(naive) > 0L,
      "expected the doc-id-keyed split to exhibit contamination on this corpus")
  }

  test("split covers every document once and stays near 80/20") {
    val dir = sf("sf0.001")
    val split = TextDedupQueries.queries("ml_split_leakfree")(spark, dir).cache()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(split.count() === nDocs)
    assert(split.select("doc_id").distinct().count() === nDocs)
    val frac = split.filter(col("split") === "train").count().toDouble / nDocs
    // clusters move in blocks, so the realized fraction wobbles around 0.80
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac implausible for 80/20")
  }
}
