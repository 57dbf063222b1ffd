package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analysis for corpus quality scoring — the web-graph signal a
  * large crawl pipeline feeds into document ranking (PageRank-family
  * centrality; the public CommonCrawl pipelines rank hosts exactly this way
  * before content filters run).
  *
  * The rank is computed in FIXED-POINT INTEGER arithmetic (micro-units of
  * mass, damping 85/100 as an integer ratio) so every iteration is exact on
  * both engines: integer sums are order-independent, where a double-sum
  * PageRank would hash-differently under Spark's nondeterministic partial-agg
  * order vs DuckDB's scan order. Cross-engine equality is therefore bit-for-
  * bit, not tolerance-based.
  */
object Graph {

  /** Mass each node starts with (and the unit the damping base is scaled
    * in): 1e6 micro-units, so five damped integer divisions retain ~20 bits
    * of rank resolution. */
  val InitMass = 1000000L

  /** Damped integer PageRank over an edge multigraph, Pregel-shaped:
    *
    *   r0(v)      = InitMass
    *   share(s)   = r(s) div outDeg(s)         — exact integer split
    *   r'(v)      = (15*InitMass) div 100 + (85 * Σ inflow shares) div 100
    *
    * Multi-edges count once per occurrence; self-loops are legal; a node
    * with no out-edges leaks its mass (the standard simplification — the
    * query layer's derived graph gives every node ≥ 1 out-link so no mass
    * leaks there). Nodes with no in-links settle at the damping base.
    *
    * Scale shape (the 100 TB story): `edges` is hash-partitioned on `src`
    * ONCE and persisted — every iteration's rank join then co-locates
    * against that one layout instead of re-shuffling |E| rows per round.
    * Each iteration costs one join (map-side against the persisted edge
    * partitioning) plus one |E|-row aggregate whose integer partial sums
    * combine map-side, so per-round shuffle volume is bounded by the
    * DISTINCT destination count, not |E|. On a real cluster a long chain
    * would checkpoint ranks every few rounds to cut lineage; at 5 rounds
    * the plan is shallow enough that lineage replay is cheaper than a
    * checkpoint write, so this implementation keeps the pure plan.
    *
    * @param edges (src: long, dst: long) — multigraph edge list
    * @param ids   (id: long) — the full node set (rank rows survive for
    *              nodes with no in-links)
    * @param iters number of damped iterations (≥ 0; 0 = uniform InitMass)
    * @return (id, rank) — exact integer rank after `iters` rounds */
  def pagerank(edges: DataFrame, ids: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val spark = edges.sparkSession
    val base = (15L * InitMass) / 100L

    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("k"))
    // one-time layout both per-iteration joins reuse
    val e = edges.join(deg, "src")
      .repartition(col("src")).persist()
    val idsP = ids.select(col("id")).repartition(col("id")).persist()
    try {
      e.count() // materialize before the loop so reps pay the layout once
      var r = idsP.withColumn("rank", lit(InitMass))
      for (_ <- 1 to iters) {
        val inflow = e.join(r.withColumnRenamed("id", "src"), "src")
          .select(col("dst"), expr("rank div k").as("share"))
          .groupBy(col("dst")).agg(sum(col("share")).as("inflow"))
        r = idsP.join(inflow.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr("(85 * coalesce(inflow, 0L)) div 100")).as("rank"))
      }
      // force the result out of the loop's lineage before unpersisting
      r.localCheckpoint(eager = true)
    } finally { e.unpersist(); idsP.unpersist() }
  }
}
