package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval resampling with gap fill — the feature-engineering step
  * that turns an irregular event stream into a dense per-entity time grid:
  * one row per (entity, interval bucket) from the entity's first to last
  * event, zero-filled counts, forward-filled categorical state. The dense
  * grid is what sequence models and join-on-time features consume.
  *
  * All arithmetic is exact integers (epoch-µs FLOOR-divided by the
  * interval — `(ts - pmod(ts, L)) div L`, matching DuckDB's `//` and
  * `Math.floorDiv` on the streaming twin even for pre-1970 negative
  * timestamps), so the result is oracle-checkable with no float
  * discipline.
  *
  * Scale notes (100 TB): three shuffles, all keyed by the entity (bounds
  * agg, per-bucket agg, grid⋈buckets + the forward-fill window share the
  * entity hash partitioning). Nothing is data-explosive: the grid's size is
  * Σ per-entity span/interval rows — the OUTPUT's size — and the window is
  * a running `last` (streaming evaluation, no frame buffering). A pathological
  * entity spanning years at second granularity makes its grid long, not
  * wide — cap spans upstream if that matters. */
object Resample {

  /** Dense (k, bucket, n, state) grid at `intervalUs` resolution.
    *
    * @param events one row per event
    * @param key    entity column
    * @param tsUs   event time, integer epoch-microseconds
    * @param state  categorical column to forward-fill (bucket's last event
    *               wins, ties on the max state — deterministic)
    */
  def resample(events: DataFrame, key: Column, tsUs: Column, state: Column,
               intervalUs: Long): DataFrame = {
    val e = events.select(key.as("k"), tsUs.as("ts_us"), state.as("state"))
      // floor division (not `div`, which truncates toward zero): negative
      // epoch-µs must land in the same bucket the oracle's `//` picks
      .withColumn("bucket",
        expr(s"(ts_us - pmod(ts_us, ${intervalUs}L)) div ${intervalUs}L"))
    val bounds = e.groupBy(col("k"))
      .agg(min(col("bucket")).as("lob"), max(col("bucket")).as("hib"))
    val grid = bounds.select(col("k"),
      explode(sequence(col("lob"), col("hib"))).as("bucket"))
    val perBucket = e.groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("ts_us"), col("state"))).as("m"))
      .select(col("k"), col("bucket"), col("n"), col("m.state").as("bucket_state"))
    val ff = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perBucket, Seq("k", "bucket"), "left")
      .select(col("k"), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("bucket_state"), ignoreNulls = true).over(ff).as("state"))
  }
}
