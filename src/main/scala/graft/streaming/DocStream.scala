package graft.streaming

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING near-dup text dedup — the continuous-crawl form of the batch
  * MinHash+LSH family (`dedup_minhash_pairs`): documents arrive as a
  * stream, and confirmed near-dup pairs leave as a stream, equal to the
  * batch UNCAPPED pipeline's pairs over whatever prefix of the corpus has
  * arrived (DedupStreamSpec proves batch-split invariance; the catalog
  * entry hash-matches the same DuckDB oracle as the incremental family).
  *
  * Spark-first shape:
  *  - signatures are PER-ROW column expressions (no streaming aggregate):
  *    the batch path's explode→groupBy minhash becomes
  *    `array_min(transform(...))` over the doc's own distinct-shingle-hash
  *    array — same kernels ([[graft.operators.TextOps.shingles3Fast]],
  *    md5Prefix60), same affine permutations, bit-identical minhashes —
  *    so the stream stays shuffle-free until the band grouping;
  *  - pair discovery is ONE stateful operator: `groupByKey(band, key)` +
  *    `flatMapGroupsWithState`, state = the bucket's (doc, shingle-hash
  *    set) membership. A new doc emits confirmed pairs against every
  *    carried member — exactly the candidates the batch band self-join
  *    finds, because band keys are per-doc (union-of-banded ==
  *    banded-of-union, the [[graft.operators.Dedup.incrementalPairs]]
  *    argument);
  *  - the exact-Jaccard confirm runs INSIDE the state function on the
  *    carried sorted hash arrays — same 60-bit hash space, same
  *    `inter/(na+nb−inter)` double division, same HALF_UP round(6) as the
  *    batch kernel, so the emitted pairs hash-match the batch oracle.
  *
  * Scale notes: per-bucket state is the bucket's membership — bounded by
  * the duplicate structure the same way the batch join's bucket cost is;
  * a production deployment puts the df-cap star OR a crawl-time watermark
  * timeout on hot buckets (here NoTimeout: the fixture corpus is bounded
  * and the batch-equality contract is the point). A pair found through
  * two bands is emitted by two groups; the sink read-back collapses them
  * with a distinct — the same dedup the batch candidate pipeline does
  * before its confirm. */
object DocStream {

  final case class BandDoc(band: Int, key: String, doc: Long, hs: Array[Long])
  final case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)
  final case class BucketState(docs: List[(Long, Array[Long])])

  import graft.operators.Dedup.{MinhashP, NumMinhash}

  /** Per-row signature + band-key columns: (doc, hs, band, key) — one row
    * per (doc, band). `hs` is the doc's SORTED distinct 60-bit shingle-hash
    * array (the confirm's exact input); band keys are the batch
    * [[graft.operators.Dedup.bandedTable]] keys built from per-row
    * `array_min` minhashes instead of a groupBy. */
  def bandRows(docs: org.apache.spark.sql.DataFrame,
               id: String, text: String): org.apache.spark.sql.DataFrame = {
    val hs = array_sort(array_distinct(transform(
      graft.operators.TextOps.shingles3Fast(col(text)),
      sh => graft.functions.VectorSql.md5Hash60(sh))))
    def minhash(h: Int): Column =
      array_min(transform(col("hs"),
        x => (lit(h.toLong * 2 + 3) * (x % MinhashP) + lit(h.toLong * 97 + 1)) % MinhashP))
    val bandKeys = (0 until NumMinhash / 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until 4).map(i => minhash(4 * b + i).cast("string")): _*).as("key"))
    }
    docs.select(col(id).as("doc"), hs.as("hs"))
      .select(col("doc"), col("hs"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc"), col("hs"))
  }

  /** Count of common elements of two SORTED arrays (merge walk). */
  private def sortedIntersect(a: Array[Long], b: Array[Long]): Int = {
    var (i, j, n) = (0, 0, 0)
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { n += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    n
  }

  // HALF_UP, like Spark's round() and DuckDB's round() (the MlQueries r4
  // convention) — the emitted jaccard must be bit-identical to the batch
  // column `round(inter/(na+nb-inter), 6)`.
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def emit(key: (Int, String), rows: Iterator[BandDoc],
                   state: GroupState[BucketState]): Iterator[NearDupPair] = {
    val carried = state.getOption.map(_.docs).getOrElse(Nil)
    // doc order within the batch for determinism; pairs are (min, max) so
    // the processing order never shows in the output
    val incoming = rows.toSeq.sortBy(_.doc)
    val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
    var acc = carried
    for (b <- incoming) {
      for ((d2, hs2) <- acc if d2 != b.doc) {
        val inter = sortedIntersect(b.hs, hs2)
        if (inter > 0) {
          val jac = inter.toDouble / (b.hs.length + hs2.length - inter)
          if (jac >= MinJaccard)
            out += NearDupPair(math.min(b.doc, d2), math.max(b.doc, d2), r6(jac))
        }
      }
      acc = (b.doc, b.hs) :: acc
    }
    state.update(BucketState(acc))
    out.iterator
  }

  val MinJaccard = 0.8

  /** The stateful pair stream: one row per (discovering band, confirmed
    * pair) — read-back distinct collapses multi-band finds. */
  def pairsStream(bands: Dataset[BandDoc]): Dataset[NearDupPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emit)
  }
}
