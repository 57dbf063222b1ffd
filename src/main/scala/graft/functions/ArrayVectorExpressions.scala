package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the two hot vector kernels (SURVEY.md
  * §7.2's optional perf tier): unlike Scala UDFs they read `ArrayData`
  * in place (no per-row array materialization, no boxing) and generate Java
  * directly into whole-stage codegen, fusing with the surrounding join/agg
  * loop. The fold is the same left-to-right IEEE order as the declarative
  * `aggregate(zip_with(...))` form and the DuckDB oracle — bit-identical.
  */
abstract class ArrayFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  /** Java source for one element step: updates accumulator `s` from `a`,`b`,`i`. */
  protected def stepJava(s: String, a: String, b: String, i: String): String
  protected def stepEval(x: ArrayData, y: ArrayData, i: Int): Double

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += stepEval(x, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepJava(s, a, b, i)}
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ a[i]·b[i] */
case class ArrayDot(left: Expression, right: Expression) extends ArrayFoldExpression {
  override protected def stepJava(s: String, a: String, b: String, i: String): String =
    s"$s += $a.getDouble($i) * $b.getDouble($i);"
  override protected def stepEval(x: ArrayData, y: ArrayData, i: Int): Double =
    x.getDouble(i) * y.getDouble(i)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot = copy(l, r)
  override def prettyName: String = "array_dot"
}

/** Σ (a[i]−b[i])² */
case class ArraySqDist(left: Expression, right: Expression) extends ArrayFoldExpression {
  override protected def stepJava(s: String, a: String, b: String, i: String): String =
    s"""double d = $a.getDouble($i) - $b.getDouble($i); $s += d * d;"""
  override protected def stepEval(x: ArrayData, y: ArrayData, i: Int): Double = {
    val d = x.getDouble(i) - y.getDouble(i); d * d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySqDist = copy(l, r)
  override def prettyName: String = "array_sqdist"
}

object ArrayVectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arraySqDist(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Make `array_dot` / `array_sqdist` callable from `spark.sql(...)` text. */
  def registerSqlFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "array_dot", args => ArrayDot(args(0), args(1)))
    ColumnBridge.registerFunction(spark, "array_sqdist", args => ArraySqDist(args(0), args(1)))
  }

  /** Runtime registration of EVERY graft native kernel on a live session —
    * the post-build sibling of [[graft.GraftExtensions]] (same function
    * names, same constructors). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    registerSqlFunctions(spark)
    ColumnBridge.registerFunction(spark, "space_tokens", args => SpaceTokens(args(0)))
    ColumnBridge.registerFunction(spark, "shingles3", args => Shingles3(args(0)))
    ColumnBridge.registerFunction(spark, "rolling_hash", args => RollingHash(args(0)))
    ColumnBridge.registerFunction(spark, "md5_prefix60", args => Md5Prefix60(args(0)))
    ColumnBridge.registerFunction(spark, "bpe_count", args => BpeCount(args(0)))
    ColumnBridge.registerFunction(spark, "bpe_tokenize", args => BpeTokenize(args(0)))
    ColumnBridge.registerFunction(spark, "nfc_normalize", args => NfcNormalize(args(0)))
    ColumnBridge.registerFunction(spark, "segments_n", args =>
      SegmentsN(args(0), args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(w, _) =>
          w.toString.toInt
        case other => throw new IllegalArgumentException(
          s"segments_n width must be a literal, got $other")
      }))
    // the custom AGGREGATE: the registry builder returns the raw
    // AggregateFunction and the analyzer wraps it (distinct/filter)
    ColumnBridge.registerFunction(spark, "kmv_agg", args =>
      KmvAgg(args(0), args(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k, _) =>
          k.toString.toInt
        case other => throw new IllegalArgumentException(
          s"kmv_agg k must be a literal, got $other")
      }))
  }
}
