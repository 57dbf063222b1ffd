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

  /** Exact epoch-micros column for `df`'s `ts`, whatever its read type. */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType          => expr("ts div 1000") // legacy nanos-as-long read
    case TimestampNTZType  => unix_micros(col("ts").cast(TimestampType))
    case _                 => unix_micros(col("ts"))
  }

  /** `ts` as a proper TIMESTAMP column (for streaming sources/watermarks). */
  def tsTimestamp(df: DataFrame): Column = timestamp_micros(tsUs(df))
}
