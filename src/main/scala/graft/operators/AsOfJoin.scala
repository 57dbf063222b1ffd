package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right payload at-or-before
  * the left row's time, per key — the canonical time-series operator Spark
  * lacks natively.
  *
  * Formulation: tag both sides, `unionByName`, one window over (key) ordered
  * by (time, tag) with `last(payload, ignoreNulls)` over an unbounded-
  * preceding ROWS frame, keep left rows. Right rows at the same timestamp
  * sort before left (tag 0 < 1) → "at or before" semantics.
  *
  * Scale: ONE shuffle on the key (the window partition) — no range-condition
  * join (which Spark would execute as a broadcast nested loop or cartesian),
  * no per-row right-side scan. Skewed keys degrade to one hot partition;
  * AQE's skew handling doesn't apply to windows, so pre-split hot keys
  * upstream if needed (see [[Salting]]).
  */
object AsOfJoin {

  /** @param left     any columns, must include `key` and `time`
    * @param right    must include `key`, `time` and `payloadCol`
    * @param outCol   name of the appended as-of payload column (null when no
    *                 right row precedes the left row) */
  def asOfLast(left: DataFrame, right: DataFrame, key: String, time: String,
               payloadCol: String, outCol: String): DataFrame = {
    val l2 = left.withColumn("_asof_m", lit(1))
    val r2 = right.select(col(key), col(time), col(payloadCol).as("_asof_p"))
      .withColumn("_asof_m", lit(0))
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("_asof_m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn(outCol, last(col("_asof_p"), ignoreNulls = true).over(w))
      .where(col("_asof_m") === 1)
      .drop("_asof_m", "_asof_p")
  }
}
