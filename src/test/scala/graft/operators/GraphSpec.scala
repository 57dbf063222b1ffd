package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer PageRank ([[Graph.pagerank]]): closed-form hand graphs, the
  * documented edge-case semantics (multi-edges, self-loops via cycle,
  * dangling leak), and decomposition invariances. */
class GraphSpec extends SparkSpec {
  import Graph.InitMass
  private val base = (15L * InitMass) / 100L

  private def run(edges: Seq[(Long, Long)], n: Long, iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("src", "dst")
    val ids = (0L until n).toDF("id")
    Graph.pagerank(e, ids, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a cycle is a fixed point: every node keeps exactly InitMass") {
    // 0→1→2→0, all out-degree 1: r' = base + 85%·InitMass = InitMass exactly
    val r = run(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 3, 5)
    assert(r == Map(0L -> InitMass, 1L -> InitMass, 2L -> InitMass))
  }

  test("star, one iteration: closed-form center/fed-leaf/starved-leaf ranks") {
    // leaves 1..4 → center 0; center → leaf 1 (no dangling nodes)
    val r = run(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)), 5, 1)
    assert(r(0L) == base + 85L * (4L * InitMass) / 100L) // 4 whole shares in
    assert(r(1L) == base + 85L * InitMass / 100L)        // the center's share
    assert(r(2L) == base && r(3L) == base && r(4L) == base) // no in-links
  }

  test("a node with no out-edges leaks its mass (documented simplification)") {
    // 0→1; node 1 dangles. Round 2: node 1's inflow is only node 0's base.
    val r = run(Seq((0L, 1L)), 2, 2)
    assert(r(0L) == base)
    assert(r(1L) == base + 85L * base / 100L)
  }

  test("multi-edges count once per occurrence; shares split by integer div") {
    // 0→1 twice plus 0→2: out-degree 3, share = InitMass div 3 = 333333,
    // node 1 receives it twice
    val share = InitMass / 3L
    val r = run(Seq((0L, 1L), (0L, 1L), (0L, 2L)), 3, 1)
    assert(r(1L) == base + 85L * (2L * share) / 100L)
    assert(r(2L) == base + 85L * share / 100L)
  }

  test("iters = 0 returns uniform InitMass; shuffle-partition count is result-invisible") {
    import spark.implicits._
    val r0 = run(Seq((0L, 1L)), 2, 0)
    assert(r0 == Map(0L -> InitMass, 1L -> InitMass))
    // a denser random-ish graph, two different shuffle widths, same ranks
    val edges = for (s <- 0L until 40L; j <- 0L to s % 4) yield (s, (s * 7 + j * 13) % 40)
    val a = run(edges, 40, 4)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      assert(run(edges, 40, 4) == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
