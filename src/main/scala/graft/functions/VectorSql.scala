package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector algebra over `array<double>` columns, built purely from
  * Catalyst higher-order functions so every operator stays inside whole-stage
  * codegen (no UDF barrier, predicate/column pruning preserved).
  *
  * Determinism note (oracle contract): `aggregate` folds left-to-right, the
  * same order DuckDB's `list_sum(list_transform(...))` uses, so distances and
  * dot products are bit-identical between Spark and the DuckDB oracle — argmin
  * and ORDER BY on these values need no rounding fudge.
  *
  * Re-expresses the reference's BLAS usage (reference
  * `linalg/BLAS.scala:104-175` dot, `util/MLUtils.scala:51-89` sqdist) as
  * declarative Spark columns instead of per-row JVM loops.
  */
object VectorSql {

  /** Cast a `list<float>`/`array<float>` parquet column to `array<double>`.
    * One consistent float→double widening, matching DuckDB's
    * `CAST(x AS DOUBLE[])` (SURVEY.md §7.3.5-6 cast discipline). */
  def asDouble(a: Column): Column = a.cast("array<double>")

  /** Squared L2 distance between two equal-length array<double> columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. sqrt is correctly-rounded IEEE so this stays
    * bit-identical to the oracle when built from the same dot products. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Portable 60-bit string hash: decimal value of the first 15 hex chars of
    * md5. DuckDB twin: `('0x' || substr(md5(s), 1, 15))::BIGINT`. Always
    * non-negative (< 2^60), exact integer arithmetic on both engines.
    * Runs as the native [[Md5Prefix60]] expression — top 60 digest bits
    * taken directly, no hex/conv string round-trip per hashed shingle
    * (identity vs this declarative form pinned in TextKernelIdentitySpec). */
  def md5Hash60(s: Column): Column = TextKernels.md5Prefix60(s)

  /** The declarative form [[md5Hash60]] replaces (kept for identity specs). */
  private[graft] def md5Hash60Declarative(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  // ---- hot-path twins ----------------------------------------------------
  // Spark's higher-order array functions (aggregate/zip_with) are
  // CodegenFallback — interpreted per element — which dominates runtime when
  // the vector op sits inside a pair join. The native codegen expressions in
  // [[ArrayVectorExpressions]] run the identical left-to-right fold as a
  // generated Java loop over ArrayData (no materialization, no boxing,
  // fused into whole-stage codegen): same IEEE operation order,
  // bit-identical results. Use them in hot paths; the declarative forms
  // above remain the readable spec.

  /** Bit-identical fast twin of [[sqDist]] (native codegen expression). */
  def sqDistFast(a: Column, b: Column): Column = ArrayVectorExpressions.arraySqDist(a, b)

  /** Bit-identical fast twin of [[dot]] (native codegen expression). */
  def dotFast(a: Column, b: Column): Column = ArrayVectorExpressions.arrayDot(a, b)

  /** Bit-identical fast twin of [[norm2]]. */
  def norm2Fast(a: Column): Column = sqrt(dotFast(a, a))
}
