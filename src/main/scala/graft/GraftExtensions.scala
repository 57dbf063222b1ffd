package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{ArrayDot, ArraySqDist, Md5Prefix60, RollingHash, Shingles3, SpaceTokens}

/** SparkSessionExtensions entry point: register the engine's native
  * expressions at session-build time —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). The runtime sibling for
  * already-created sessions is
  * `ArrayVectorExpressions.registerSqlFunctions(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // rewrite window-rank top-k into the heap operator (needs the strategy
    // above to plan the node it produces)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    // SQL MERGE INTO / UPDATE on graftstore tables → commitMerge commands
    // (runtime sibling: spark.experimental.extraOptimizations)
    ext.injectPostHocResolutionRule(_ => graft.sources.GraftRowLevelRewrite)
    // MERGE INTO a CATALOG-resolved graftstore table: mask ACCEPT_ANY_SCHEMA
    // on the merge target so the analyzer resolves the statement (the
    // capability reads as skipSchemaResolution there) — see the rule's doc
    ext.injectResolutionRule(_ => graft.sources.GraftMergeAnalysis)
    ext.injectFunction((
      FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("array_sqdist"),
      new ExpressionInfo(classOf[ArraySqDist].getName, "array_sqdist"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArraySqDist(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("space_tokens"),
      new ExpressionInfo(classOf[SpaceTokens].getName, "space_tokens"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SpaceTokens(args(0))))
    ext.injectFunction((
      FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Shingles3(args(0))))
    ext.injectFunction((
      FunctionIdentifier("segments_n"),
      new ExpressionInfo(classOf[graft.functions.SegmentsN].getName, "segments_n"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SegmentsN(args(0), args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(w, _) =>
            w.toString.toInt
          case other => throw new IllegalArgumentException(
            s"segments_n width must be a literal, got $other")
        })))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"), // same name/semantics as DuckDB's
      new ExpressionInfo(classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.NfcNormalize(args(0))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(args(0))))
    ext.injectFunction((
      FunctionIdentifier("bpe_count"),
      new ExpressionInfo(classOf[graft.functions.BpeCount].getName, "bpe_count"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeCount(args(0))))
    ext.injectFunction((
      FunctionIdentifier("bpe_tokenize"),
      new ExpressionInfo(classOf[graft.functions.BpeTokenize].getName, "bpe_tokenize"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.BpeTokenize(args(0))))
    // custom AGGREGATE function: kmv_agg(hash_long, k) → struct(nh, hk)
    ext.injectFunction((
      FunctionIdentifier("kmv_agg"),
      new ExpressionInfo(classOf[graft.functions.KmvAgg].getName, "kmv_agg"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.KmvAgg(args(0), args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(k, _) =>
            k.toString.toInt
          case other => throw new IllegalArgumentException(
            s"kmv_agg k must be a literal, got $other")
        }))) // raw AggregateFunction: the analyzer wraps it (distinct/filter)
  }
}
