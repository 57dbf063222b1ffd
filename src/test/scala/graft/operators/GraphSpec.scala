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

  private def tri(edges: Seq[(Long, Long)], n: Long): Map[Long, Long] = {
    import spark.implicits._
    Graph.triangleCounts(edges.toDF("src", "dst"), (0L until n).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangles: K4 gives 3 per node; isolated and path nodes give 0") {
    // K4 on 0..3 (4 triangles, each node in 3), pendant 4-5 edge, isolated 6
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    val r = tri(k4 ++ Seq((4L, 5L)), 7)
    assert(r == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L,
      4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("triangles: self-loops, duplicate and reversed edges don't inflate counts") {
    // one triangle 0-1-2, listed with duplicates, both directions, a
    // self-loop, and a chord-free square 3-4-5-6 (no triangle)
    val messy = Seq((0L, 1L), (1L, 0L), (1L, 2L), (1L, 2L), (2L, 0L),
      (0L, 0L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 3L))
    val r = tri(messy, 7)
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L,
      3L -> 0L, 4L -> 0L, 5L -> 0L, 6L -> 0L))
  }

  test("triangles: hub skew — star plus one rim edge yields exactly one triangle") {
    // hub 0 linked to 1..20; single rim edge 1-2: the only triangle is
    // (0,1,2). Orientation sends rim nodes (degree ≤ 2) toward the hub,
    // so the hub pivots no wedges — the skew-cap property in miniature.
    val star = (1L to 20L).map(i => (0L, i))
    val r = tri(star ++ Seq((1L, 2L)), 21)
    assert(r(0L) == 1L && r(1L) == 1L && r(2L) == 1L)
    assert((3L to 20L).forall(r(_) == 0L))
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

  private def cn(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Graph.commonNeighbors(edges.toDF("src", "dst"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("common neighbors: path 0-1-2 predicts (0,2) with RA = 1e6 div deg(1)") {
    assert(cn(Seq((0L, 1L), (1L, 2L)), 10) == Set((0L, 2L, 1L, 500000L)))
  }

  test("common neighbors: 4-cycle — two predicted chords, RA sums over both pivots") {
    // square 0-1-2-3-0: chord (0,2) via pivots 1 and 3, chord (1,3) via 0
    // and 2; every pivot degree 2 → ra = 2 · (1e6 div 2)
    val r = cn(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)), 10)
    assert(r == Set((0L, 2L, 2L, 1000000L), (1L, 3L, 2L, 1000000L)))
  }

  test("common neighbors: triangles emit nothing (all pairs adjacent)") {
    assert(cn(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 10).isEmpty)
  }

  private def lp(edges: Seq[(Long, Long)], n: Long, iters: Int): Map[Long, Long] = {
    import spark.implicits._
    Graph.labelPropagate(edges.toDF("src", "dst"), (0L until n).toDF("id"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("label propagation: a triangle collapses to label 0 by round 2") {
    // round 1: 0→1 (nbr labels {1,2}, tie → min), 1→0, 2→0; round 2: all 0
    assert(lp(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 3, 1) ==
      Map(0L -> 1L, 1L -> 0L, 2L -> 0L))
    assert(lp(Seq((0L, 1L), (1L, 2L), (0L, 2L)), 3, 3) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("label propagation: isolated and self-loop-only nodes keep their own label") {
    // node 3 isolated; node 4 has only a self-loop (dropped by
    // canonicalization) — both must survive with label = id
    val r = lp(Seq((0L, 1L), (4L, 4L)), 5, 3)
    assert(r(3L) == 3L && r(4L) == 4L)
  }

  test("label propagation: two cliques converge to two communities") {
    val k3a = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val k3b = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    import spark.implicits._
    val r = Graph.labelPropagate((k3a ++ k3b).toDF("src", "dst"),
        Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 1L, 2L).forall(r(_) == 0L))
    assert(Set(10L, 11L, 12L).forall(r(_) == 10L))
  }
}
