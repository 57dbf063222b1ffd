package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Physical-type-agnostic reader for the events `ts` column.
  *
  * The driver's testdata generator has produced `events.parquet` with two
  * different physical timestamp encodings across rounds:
  *
  *  - `timestamp[ns]` — Spark 4's vectorized reader refuses nanos
  *    (PARQUET_TYPE_ILLEGAL), so the query readers set
  *    `spark.sql.legacy.parquet.nanosAsLong` and the column arrives as a
  *    BIGINT of epoch-nanoseconds;
  *  - `timestamp[us]` (isAdjustedToUTC=false) — arrives as TIMESTAMP_NTZ
  *    under Spark's NTZ inference; the legacy flag is a no-op for it.
  *
  * Every event query works on exact integer epoch-microseconds, so this
  * helper is the single place that maps whatever the scan produced to
  * `ts_us`. NTZ values are interpreted as UTC (cast via the session zone,
  * which the callers pin to UTC) — the same naive-as-UTC read DuckDB's
  * `epoch_us` does on its side of the oracle, so the contract is unchanged
  * across generator encodings. Keeping the LongType branch keeps old
  * GenScale-produced layouts (`target/sf1`, `target/sf10`) readable too.
  */
private[graft] object EventTs {

  // Plausible epoch-NANOSECOND range for the generator's event clock:
  // 1990-01-01 .. 2100-01-01. Epoch-MICROsecond values for the same dates
  // are 1000× smaller and land entirely below the lower bound, so a future
  // generator writing plain int64 micros (no timestamp logical type) fails
  // LOUD here instead of silently shifting every timestamp 1000× (r7
  // advisory). The check is one codegen'd comparison per row.
  private val NsLo = 631152000000000000L   // 1990-01-01 in epoch-ns
  private val NsHi = 4102444800000000000L  // 2100-01-01 in epoch-ns

  /** Exact epoch-micros column for `df`'s `ts`, whatever its read type. */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => // legacy nanos-as-long read; guard the ns assumption
      expr(s"""CASE WHEN ts BETWEEN ${NsLo}L AND ${NsHi}L THEN ts div 1000
              |ELSE raise_error(concat('events.ts long value ', CAST(ts AS STRING),
              |  ' outside the plausible epoch-nanosecond range — is the generator',
              |  ' now writing int64 micros? (EventTs.tsUs assumes int64 = ns)'))
              |END""".stripMargin)
    case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
    case _                 => unix_micros(col("ts"))
  }

  /** `ts` as a proper TIMESTAMP column (for streaming sources/watermarks). */
  def tsTimestamp(df: DataFrame): Column = timestamp_micros(tsUs(df))
}
