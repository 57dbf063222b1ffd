package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING semantic (embedding-space) near-dup dedup — the
  * embedding-family member of the streaming dedup pair
  * ([[DocStream]] is the text/MinHash member): vectors arrive as a
  * stream, and exact-cosine-confirmed near-dup pairs leave as a stream,
  * equal to the batch sign-LSH pipeline
  * ([[graft.operators.Similarity.lshNearDupPairs]]) over whatever prefix
  * of the corpus has arrived. A continuous-crawl pipeline dedups
  * embeddings on arrival exactly like text (r8 verdict ask #5).
  *
  * Spark-first shape, mirroring [[DocStream]]:
  *  - band keys are PER-ROW column expressions (the batch
  *    `lshSignBands` is already per-row: 64 codegen dots → sign bits →
  *    packed band keys; [[bandRows]] just carries the vector alongside),
  *    so the stream stays shuffle-free until the band grouping;
  *  - pair discovery is ONE stateful operator: `groupByKey(band, key)` +
  *    `flatMapGroupsWithState`, state = the bucket's carried (vec_id,
  *    vector, norm) members. A new vector emits confirmed pairs against
  *    every carried member — exactly the candidates the batch band
  *    self-join finds, because band keys are per-row (union-of-banded ==
  *    banded-of-union);
  *  - the exact-cosine confirm runs INSIDE the state function as the
  *    SAME left-to-right IEEE folds the batch codegen kernels run
  *    (`dot/(sqrt(dot(a,a))·sqrt(dot(b,b)))`, norms computed once per
  *    carried member), same HALF_UP round(6) — so the emitted pairs
  *    hash-match the batch oracle.
  *
  * Scale notes: per-bucket PAIR WORK is bounded by the bucket's
  * population like the batch band join's, but STATE is not — every
  * vector lands in one bucket per band and each bucket carries its full
  * (vec_id, vector, norm) membership under NoTimeout, so total state is
  * bands × N full vectors (~`bands`× the corpus), corpus-sized
  * regardless of duplicate structure. That is fine for this gated
  * bounded-corpus entry; a CONTINUOUS deployment needs an eviction
  * story, which the semantics admit because near-dup discovery only
  * needs each incoming vector compared against the dedup HORIZON:
  * (a) event-time watermark + `GroupStateTimeout.EventTimeTimeout`
  * expiring buckets idle past the horizon (pairs against expired history
  * are, by policy, no longer deletions), or (b) per-bucket compaction to
  * cluster exemplars — carried members already confirmed ≥ MinCos
  * against an earlier member collapse to the earliest member, the
  * transitive-keep rule the batch `dedup_cc_keep_list` applies — which
  * bounds state by the DISTINCT-cluster count, or (c) tiering cold
  * buckets to the versioned store and confirming against them in a
  * `foreachBatch` join (state holds only the hot set). Band WIDTH must
  * grow with corpus size ([[graft.operators.Similarity.bitsPerBand]]) —
  * a deployment re-bands when the corpus crosses a width threshold (the
  * `dedup_simhash_incremental` discipline); the bounded-corpus entry
  * sizes bands from the staged corpus count up front. A pair found
  * through two bands is emitted by two groups; the sink read-back
  * collapses them with a distinct, like the batch candidate DISTINCT. */
object EmbStream {

  final case class BandVec(band: Int, key: Long, vec_id: Long, v: Array[Double])
  final case class CosPair(vec_a: Long, vec_b: Long, cos_sim: Double)
  final case class VecBucket(vecs: List[(Long, Array[Double], Double)])

  /** Per-row sign-LSH band keys carrying the vector: (band, key, vec_id,
    * v) — [[graft.operators.Similarity.lshSignBands]] with `v` carried
    * for the in-state confirm (shared construction BY CONSTRUCTION, not
    * by parallel code). */
  def bandRows(points: DataFrame, nBits: Int, bands: Int): DataFrame =
    graft.operators.Similarity.lshSignBands(points, nBits, bands, carry = Seq("v"))
      .select(col("band"), col("key"), col("vec_id"), col("v"))

  // the batch codegen kernels' exact folds (ArrayDot is a left-to-right
  // acc += a(i)*b(i); norm2Fast = sqrt(dot(v,v))) — bit-identical here
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var (i, acc) = (0, 0.0)
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  val MinCos = graft.operators.Similarity.MinCos

  private def emit(key: (Int, Long), rows: Iterator[BandVec],
                   state: GroupState[VecBucket]): Iterator[CosPair] = {
    val carried = state.getOption.map(_.vecs).getOrElse(Nil)
    val incoming = rows.toSeq.sortBy(_.vec_id)
    val out = scala.collection.mutable.ListBuffer.empty[CosPair]
    var acc = carried
    for (b <- incoming) {
      val nb = math.sqrt(dot(b.v, b.v))
      for ((id2, v2, n2) <- acc if id2 != b.vec_id) {
        val cos = dot(b.v, v2) / (nb * n2)
        if (cos >= MinCos)
          out += CosPair(math.min(b.vec_id, id2), math.max(b.vec_id, id2), r6(cos))
      }
      acc = (b.vec_id, b.v, nb) :: acc
    }
    state.update(VecBucket(acc))
    out.iterator
  }

  /** The stateful pair stream: one row per (discovering band, confirmed
    * pair) — read-back distinct collapses multi-band finds. */
  def pairsStream(bands: Dataset[BandVec]): Dataset[CosPair] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band, b.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(emit)
  }
}
