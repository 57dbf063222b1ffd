package graft.operators

import graft.functions.{Bpe, BpeKernels}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING — the merges-table LEARNING step a
  * pretraining pipeline runs before any tokenization (the static
  * [[graft.functions.Bpe.Merges]] table is what such a run produces).
  *
  * Classic Sennrich training, shaped for a cluster:
  *  1. ONE corpus pass builds the word-frequency table (pre-token →
  *    occurrence count) — the only data-scale shuffle; everything after
  *    runs on the vocabulary, which is orders of magnitude smaller than
  *    the corpus (Zipf) and is cached once.
  *  2. Each round: encode every vocab word under the merges learned so far
  *    (per-partition kernel, no shuffle), emit its adjacent symbol pairs
  *    weighted by word frequency (overlapping occurrences count — the
  *    standard training count), one map-side-combined aggregation, then an
  *    argmax via orderBy+limit(1) (TakeOrderedAndProject — a 1-row
  *    collect, never a driver-side scan). Ties break (freq DESC, left ASC,
  *    right ASC) — total order, so the learned table is deterministic.
  *  3. The winning pair joins the merges list; repeat.
  *
  * Cost: rounds × O(vocab) jobs after one corpus pass — the standard
  * distributed-BPE shape (vocab fits comfortably per executor even at
  * 100 TB corpus scale; the corpus itself is never revisited).
  *
  * The DuckDB oracle replays the SAME rounds: wrapped-symbol encoding, pair
  * extraction via list slicing, argmax with the identical tie-break, and
  * the winner applied through a scalar-subquery `replace` — so a drift in
  * any round's count, tie-break, or application breaks the hash.
  */
object BpeTrainer {

  final case class SymPair(l: String, r: String)

  /** Learn `rounds` merges from scratch over `textCol`. Returns one row per
    * round: (round, merge_l, merge_r, freq). */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = docs.sparkSession
    import spark.implicits._

    val wordCounts = docs
      .select(explode(BpeKernels.preTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(eager = true) // rounds re-scan the vocab, not the corpus

    var merges = Vector.empty[(String, String)]
    val learned = Vector.newBuilder[(Int, String, String, Long)]
    for (round <- 1 to rounds) {
      val sofar = merges // stable closure capture per round
      val pairsOf = udf { (w: String) =>
        val syms = Bpe.encodeWordWith(w, sofar)
        Array.tabulate(math.max(syms.length - 1, 0))(i => SymPair(syms(i), syms(i + 1)))
      }
      val top = wordCounts
        .select(explode(pairsOf(col("w"))).as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      require(top.nonEmpty, s"round $round: no adjacent pairs left to merge")
      val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges :+= ((l, r))
      learned += ((round, l, r, f))
    }
    learned.result().toDF("round", "merge_l", "merge_r", "freq")
  }
}
