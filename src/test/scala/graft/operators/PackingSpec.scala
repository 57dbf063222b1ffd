package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded linear sequence packing: boundary semantics + shard determinism. */
class PackingSpec extends SparkSpec {

  private def pack(rows: Seq[(Long, Int)], budget: Int, shards: Int = 1) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "n")
    Packing.packSequences(df, "doc_id", col("n"), budget, shards)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))  // (doc, pack, offset)
  }

  test("docs fill packs in order; a doc starts in the pack of its cum-before") {
    // budget 10: docs of 4,4,4 → cum-before 0,4,8 → packs 0,0,0 (last
    // overflows by 2 — linear packing lets the tokenizer split it)
    assert(pack(Seq((1L, 4), (2L, 4), (3L, 4)), 10).toSeq ==
      Seq((1L, 0L, 0L), (2L, 0L, 4L), (3L, 0L, 8L)))
  }

  test("a doc whose cum-before lands exactly on the budget opens a new pack") {
    // 6+4 = 10 → third doc starts at offset 0 of pack 1, not offset 10
    assert(pack(Seq((1L, 6), (2L, 4), (3L, 3)), 10).toSeq ==
      Seq((1L, 0L, 0L), (2L, 0L, 6L), (3L, 1L, 0L)))
  }

  test("shard assignment is a pure function of doc identity, not row order") {
    import spark.implicits._
    val a = Seq((1L, 5), (2L, 5), (3L, 5)).toDF("doc_id", "n")
    val b = Seq((3L, 5), (1L, 5), (2L, 5)).toDF("doc_id", "n").repartition(3)
    val pa = Packing.packSequences(a, "doc_id", col("n"), 8, 4)
      .select("doc_id", "shard", "pack_id", "offset").collect().toSet
    val pb = Packing.packSequences(b, "doc_id", col("n"), 8, 4)
      .select("doc_id", "shard", "pack_id", "offset").collect().toSet
    assert(pa == pb)
  }

  test("plan: one window over the shard partition, no global sort") {
    import spark.implicits._
    val df = (1L to 100L).map((_, 7)).toDF("doc_id", "n")
    val p = Packing.packSequences(df, "doc_id", col("n"), 64, 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), "running total must be a window, not a self-join")
    assert(!p.toLowerCase.contains("cartesian"), "no quadratic plan")
  }
}
