package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** text_inverted_index: the delta encoding must round-trip (reconstructing
  * ids from block base + cumulative deltas recovers the exact posting set),
  * and the block segmentation must bound per-group size for arbitrarily
  * common terms — the skew claim the design rests on. */
class InvertedIndexSpec extends SparkSpec {
  private val dir = sf("sf0.001")
  private val B = TextDedupQueries.InvBlockDocs

  test("per-term df/cf agree with direct counts; a ubiquitous term spans many blocks") {
    import spark.implicits._
    val idx = TextDedupQueries.textInvertedIndex(spark, dir)
      .select("term", "df", "cf", "n_blocks")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(graft.operators.TextOps.tokensFast(col("text"))).as("term"))
      .groupBy("term")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("cf"))
      .as[(String, Long, Long)].collect()
    assert(direct.nonEmpty)
    direct.foreach { case (t, df, cf) =>
      val (_, idf, icf, nb) = idx(t)
      assert(idf == df && icf == cf, s"term $t: df/cf mismatch")
      // each 16-wide id block holds at most B docs, so a term in df docs
      // occupies at least ceil(df / B) blocks — a regression collapsing
      // postings across blocks (the skew failure the design prevents) dies here
      assert(nb >= (df + B - 1) / B && nb <= df, s"term $t: $nb blocks for df $df")
    }
    // the corpus has at least one term common enough to need multiple blocks
    assert(idx.values.exists(_._4 > 1), "no multi-block term — block machinery unexercised")
  }

  test("delta streams round-trip to the exact posting sets (hand corpus)") {
    import spark.implicits._
    import java.nio.file.Files
    // ids straddle block boundaries (B = 16): term "x" in docs 3,5,17,18,40
    val tmp = Files.createTempDirectory("invidx").toString
    Seq(
      (3L, "x a"), (5L, "x"), (17L, "x b"), (18L, "x"), (40L, "x x"),
      (4L, "a"), (19L, "b")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("source", lit("t")).withColumn("n_chars", length(col("text")))
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextDedupQueries.textInvertedIndex(spark, tmp)
      .where(col("term") === "x")
      .select("df", "cf", "n_blocks", "index_hash").as[(Long, Long, Long, Long)].head()
    assert(got._1 == 5 && got._2 == 6 && got._3 == 3) // blocks 0, 1, 2
    // expected hash: replay the documented encoding by hand
    //   blk 0: ids 3,5   → deltas 3-0,  5-3   = "3,2"
    //   blk 1: ids 17,18 → deltas 17-16, 1    = "1,1"
    //   blk 2: ids 40    → deltas 40-32       = "8"
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val expected = h60(Seq(0L -> h60("3,2"), 1L -> h60("1,1"), 2L -> h60("8"))
      .map { case (b, p) => s"$b:$p" }.mkString(";"))
    assert(got._4 == expected, "index hash must equal the hand-chained encoding")
  }
}
