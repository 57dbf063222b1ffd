package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — one of the operators the build target names
  * that Spark has no shuffle-friendly plan for: `a JOIN b ON a.v >= b.lo AND
  * a.v < b.hi` plans as BroadcastNestedLoopJoin (every point × every range)
  * or a cartesian product, both quadratic in the worst case.
  *
  * Standard binning rewrite: pick a bin width, replicate each range into
  * every bin it overlaps (⌈span/width⌉+1 rows — ranges tables are small
  * dimension sides, replication is cheap), bucket each point into exactly ONE
  * bin, equi-join on the bin id, then re-check the exact predicate. The big
  * side is never replicated and shuffles once on the bin key (or not at all
  * when the replicated ranges broadcast); cost is |points| + Σ spans/width
  * join rows instead of |points|·|ranges|.
  *
  * Bin width tuning: ~ the median range span. Too small → more range
  * replicas; too large → more false candidates filtered after the join.
  * Both are linear knobs, never quadratic.
  */
object RangeJoin {

  /** Ranges replicated to their overlapping bins: adds a `_bin` column.
    * Replicates through floor(hi/binWidth) unconditionally — when hi sits
    * exactly on a bin edge the last replica can never match (hi is
    * exclusive and the recheck filters it), but an epsilon-based trim
    * would DROP matches for points within the epsilon of an edge-crossing
    * hi, and no-op entirely once |hi| is large enough that the epsilon is
    * below one ulp. One dead replica per edge-aligned range is free;
    * a silently lost match is not. */
  private def binned(ranges: DataFrame, lo: Column, hi: Column, binWidth: Double): DataFrame =
    ranges.withColumn("_bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))

  /** Join `points` (each row one value `pointCol`) against `ranges` rows
    * satisfying `lo <= point < hi`. Overlapping ranges produce one output
    * row per match, exactly like the theta join. */
  def pointInRange(points: DataFrame, pointCol: Column,
                   ranges: DataFrame, lo: Column, hi: Column,
                   binWidth: Double): DataFrame = {
    val p = points.withColumn("_bin", floor(pointCol / binWidth).cast("long"))
    val r = binned(ranges, lo, hi, binWidth)
    p.join(broadcast(r), Seq("_bin"))
      .where(pointCol >= lo && pointCol < hi)
      .drop("_bin")
  }
}
