package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for BOTH packers over random corpora — the
  * boundary cases a handful of examples can miss (empty docs, oversize docs,
  * exact fills, degenerate budgets). Plain ScalaCheck generators driven from
  * FIXED seeds (no scalatestplus bridge in the offline cache, and fixed
  * seeds keep CI deterministic); few-but-large cases since each spins Spark
  * jobs. */
class PackingPropertySpec extends SparkSpec {

  private val corpusGen: Gen[(List[Int], Int, Int)] = for {
    n <- Gen.choose(1, 120)
    sizes <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(0, 40), 1 -> Gen.const(0), 1 -> Gen.choose(60, 200)))
    budget <- Gen.choose(16, 64)
    shards <- Gen.choose(1, 4)
  } yield (sizes, budget, shards)

  private def cases(n: Int): Seq[(List[Int], Int, Int)] =
    (1 to n).map(i => corpusGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("no-split packer invariants hold on random corpora") {
    cases(6).foreach { case (sizes, budget, shards) =>
      import spark.implicits._
      val clue = s"(n=${sizes.length}, budget=$budget, shards=$shards)"
      val docs = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "n")
      val out = Packing.packSequencesNoSplit(docs, "doc_id", col("n"), budget, shards)
        .collect()
      assert(out.length == sizes.length, s"every doc assigned exactly once $clue")
      out.groupBy(r => (r.getLong(1), r.getLong(2))).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getLong(3))
        // offsets tile the pack contiguously from 0
        assert(sorted.head.getLong(3) == 0L, clue)
        sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
          assert(a.getLong(3) + a.getLong(4) == b.getLong(3), clue)
        }
        val used = sorted.map(r => r.getLong(3) + r.getLong(4)).max
        // a pack only overflows when a single doc exceeds the whole budget
        if (rs.forall(_.getLong(4) <= budget)) assert(used <= budget, clue)
        // waste matches the fill, clamped at 0, same value on every row
        val waste = math.max(budget - used, 0L).toDouble / budget
        rs.foreach(r => assert(r.getDouble(5) == waste, clue))
      }
      // within a shard, pack ids are dense from 0 in doc order
      out.groupBy(_.getLong(1)).foreach { case (_, rs) =>
        val packsInOrder = rs.sortBy(_.getLong(0)).map(_.getLong(2))
        assert(packsInOrder.head == 0L, clue)
        packsInOrder.zip(packsInOrder.drop(1)).foreach { case (a, b) =>
          assert(b == a || b == a + 1, s"next-fit never skips or reuses a pack id $clue")
        }
      }
    }
  }

  test("splitting packer conserves tokens and keeps offsets in [0, budget)") {
    cases(6).foreach { case (sizes, budget, shards) =>
      import spark.implicits._
      val clue = s"(n=${sizes.length}, budget=$budget, shards=$shards)"
      val docs = sizes.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "n")
      val out = Packing.packSequences(docs, "doc_id", col("n"), budget, shards)
        .collect()
      assert(out.length == sizes.length, clue)
      assert(out.forall(r => r.getLong(3) >= 0 && r.getLong(3) < budget), clue)
      // per shard: pack_id * budget + offset is the exact running token total
      out.groupBy(_.getLong(1)).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getLong(0))
        var cum = 0L
        sorted.foreach { r =>
          assert(r.getLong(2) * budget + r.getLong(3) == cum,
            s"start position must equal the tokens before this doc $clue")
          cum += r.getLong(4)
        }
      }
    }
  }
}
