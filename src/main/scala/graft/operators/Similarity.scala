package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorSql._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers (as the build target demands):
  *  - [[bruteTopK]]: exact cosine top-k — probe set broadcast against the
  *    full corpus, per-probe partial top-k via window argmin. The baseline.
  *  - [[ivfTopK]]: IVF-style: corpus pre-partitioned into cells by nearest
  *    centroid (the SOM prototype table doubles as the coarse quantizer);
  *    probes scan only the `nprobe` nearest cells. At 100 TB the cell
  *    assignment is the only full pass; each query touches ~nprobe/K of the
  *    data, and the cell-assigned corpus can be bucketed/partitioned by cell
  *    on disk so a probe reads only its cells' files (partition pruning).
  *
  * Cosines are bit-identical with the DuckDB oracle (same left-to-right
  * folds) so top-k ordering with id tie-break needs no tolerance.
  */
object Similarity {

  /** Norms are precomputed per side — one O(d) fold per VECTOR instead of
    * two per PAIR; the value is bit-identical to computing sqrt(dot(v,v))
    * inside the pair (same expression, same input), so the oracle needs no
    * change. */
  private def cosFromNorms(v: Column, p: Column, nv: Column, np: Column): Column =
    dotFast(v, p) / (nv * np)

  /** (vec_id, v) against (probe_id, p): exact top-k by cosine, per probe.
    * Self-pairs excluded.
    *
    * With `useHeapOperator` (requires [[graft.plans.TopKPerKeyStrategy]] on
    * the session) the per-probe top-k runs through the custom heap operator:
    * the data-scale candidate stream is pruned to k rows per (probe,
    * partition) BEFORE any exchange, and only the ≤k·|probes| survivors pay
    * the rank window — instead of shuffling and fully sorting every
    * candidate row per probe. Identical output either way. */
  def bruteTopK(points: DataFrame, probes: DataFrame, k: Int,
                useHeapOperator: Boolean = false): DataFrame = {
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    val cands = points.withColumn("nv", norm2Fast(col("v")))
      .crossJoin(broadcast(probes.withColumn("np", norm2Fast(col("p")))))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
    val top =
      if (useHeapOperator)
        graft.plans.TopKPerKey.topKPerKey(cands, Seq(col("probe_id")),
          Seq(col("cos").desc, col("vec_id").asc), k)
      else cands
    top.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** IVF top-k: points pre-assigned to `cell` (nearest centroid), probes scan
    * the nprobe nearest cells only.
    * @param assigned (vec_id, v, cell)
    * @param centroids (cell, c) — small, broadcast
    * @param probes (probe_id, p) */
  def ivfTopK(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    // probe → nprobe nearest cells (tiny cross join, all broadcast-side)
    val cellRank = Window.partitionBy(col("probe_id")).orderBy(col("cd2"), col("cell"))
    val probeCells = probes.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("p"), col("cell"), sqDistFast(col("p"), col("c")).as("cd2"))
      .withColumn("crn", row_number().over(cellRank))
      .where(col("crn") <= nprobe)
      .select(col("probe_id"), col("p"), col("cell"))
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.withColumn("nv", norm2Fast(col("v")))
      .join(broadcast(probeCells.withColumn("np", norm2Fast(col("p")))), "cell")
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosFromNorms(col("v"), col("p"), col("nv"), col("np")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding near-dup: each vector's nearest neighbor within its IVF cell
    * (blocked all-pairs — never the global N² join), kept if cosine ≥
    * minCos. @param assigned (vec_id, v, cell) */
  def nearestInCell(assigned: DataFrame, minCos: Double): DataFrame = {
    val w = Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))
    // localCheckpoint: the cell self-join would recompute the centroid
    // assignment once per side otherwise.
    val an = assigned.withColumn("nrm", norm2Fast(col("v")))
      .localCheckpoint(eager = true)
    an.as("a").join(an.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        cosFromNorms(col("a.v"), col("b.v"), col("a.nrm"), col("b.nrm")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("cos") >= minCos)
      .select(col("a_id").as("vec_id"), col("b_id").as("nn_id"),
        round(col("cos"), 6).as("cos_sim"))
  }
}
