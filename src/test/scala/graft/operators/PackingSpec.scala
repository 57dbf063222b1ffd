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

  private def packNoSplit(rows: Seq[(Long, Int)], budget: Int, shards: Int = 1) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "n")
    Packing.packSequencesNoSplit(df, "doc_id", col("n"), budget, shards)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(5)))
  }

  test("no-split: a doc that would overflow closes the pack (next-fit)") {
    // budget 10: 4,4,4 → third doc does NOT fit (8+4>10) → pack 1;
    // pack 0 used=8 → waste 0.2, pack 1 used=4 → waste 0.6
    assert(packNoSplit(Seq((1L, 4), (2L, 4), (3L, 4)), 10).toSeq ==
      Seq((1L, 0L, 0L, 0.2), (2L, 0L, 4L, 0.2), (3L, 1L, 0L, 0.6)))
  }

  test("no-split: an exact fill closes cleanly with zero waste") {
    assert(packNoSplit(Seq((1L, 6), (2L, 4), (3L, 3)), 10).toSeq ==
      Seq((1L, 0L, 0L, 0.0), (2L, 0L, 6L, 0.0), (3L, 1L, 0L, 0.7)))
  }

  test("no-split: an oversize doc gets its own overflowing pack, waste 0") {
    // 25 > budget 10: alone in pack 1 (7 can't share — 7+25>10), waste
    // clamps at 0; the trailing 5 opens pack 2
    assert(packNoSplit(Seq((1L, 7), (2L, 25), (3L, 5)), 10).toSeq ==
      Seq((1L, 0L, 0L, 0.3), (2L, 1L, 0L, 0.0), (3L, 2L, 0L, 0.5)))
  }

  test("no-split: zero-length docs never force a pack break") {
    // used stays 0 through the zero docs; the 12 (oversize) joins pack 0
    // because the pack is still empty
    assert(packNoSplit(Seq((1L, 0), (2L, 0), (3L, 12), (4L, 2)), 10).toSeq ==
      Seq((1L, 0L, 0L, 0.0), (2L, 0L, 0L, 0.0), (3L, 0L, 0L, 0.0), (4L, 1L, 0L, 0.8)))
  }

  test("no-split: docs never straddle packs; waste matches per-pack fill") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, (i % 9 + 1).toInt)).toDF("doc_id", "n")
    val out = Packing.packSequencesNoSplit(df, "doc_id", col("n"), 16, 4).collect()
    val byPack = out.groupBy(r => (r.getLong(1), r.getLong(2)))
    byPack.foreach { case ((_, _), rs) =>
      val used = rs.map(r => r.getLong(3) + r.getLong(4)).max
      assert(used <= 16, "no pack overflows when every doc fits the budget")
      val waste = (16 - used).toDouble / 16
      rs.foreach(r => assert(r.getDouble(5) == waste))
      // offsets tile the pack contiguously
      val sorted = rs.sortBy(_.getLong(3))
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a.getLong(3) + a.getLong(4) == b.getLong(3))
      }
    }
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
