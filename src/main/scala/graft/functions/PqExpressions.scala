package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (ann_pq). The codebook is embedded as a
  * CODEGEN REFERENCE OBJECT (`ctx.addReferenceObj`), not as literal
  * expression nodes: the classic PQ config (256 codes × 8 subspaces × 8
  * dims) would be ~33k `Literal`s as a declarative tree — a multi-MB plan
  * and a generated method past the JVM 64 KB limit (Janino would fall back
  * to interpreted). As a reference it is one `double[][]` and a tight
  * triple loop, O(1) generated code regardless of codebook size, fused
  * into whole-stage codegen. The interpreted `nullSafeEval` twin runs the
  * same loop (spec-asserted identical).
  *
  * Float discipline: the per-subspace sqdist accumulates left-to-right —
  * the same IEEE fold as [[ArraySqDist]] and the oracle's
  * `list_sum(list_transform(range(...)))`; the argmin keeps the FIRST
  * minimum (strict `<`), matching `row_number() OVER (ORDER BY d2, code)`.
  * So codes — and everything downstream of them — are bit-identical in
  * DuckDB.
  */
abstract class PqExpression extends UnaryExpression {
  def cb: Array[Array[Double]]
  def subDims: Int
  protected def nSub: Int = cb(0).length / subDims

  protected def childTypeOk: Boolean
  protected def childTypeWant: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (childTypeOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $childTypeWant, got ${child.dataType.simpleString}")
}

/** v (array<double>, d dims) → array<int> of d/subDims codes: per subspace
  * the index of the nearest codebook subvector. */
case class PqEncode(child: Expression, cb: Array[Array[Double]], subDims: Int)
  extends PqExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def childTypeOk: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }
  override protected def childTypeWant: String = "array<double>"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val codes = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val row = cb(c)
        var d2 = 0.0
        var i = 0
        while (i < subDims) {
          val d = x.getDouble(m * subDims + i) - row(m * subDims + i)
          d2 += d * d
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int[] $codes = new int[$nSub];
         |for (int $m = 0; $m < $nSub; $m++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < ${cb.length}; $c++) {
         |    double $d2 = 0.0;
         |    for (int $i = 0; $i < $subDims; $i++) {
         |      double $d = $v.getDouble($m * $subDims + $i) - $cbRef[$c][$m * $subDims + $i];
         |      $d2 += $d * $d;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |  }
         |  $codes[$m] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** codes (array<int>) → ẑ (array<double>, d dims): each subspace replaced by
  * its chosen code's subvector — the ADC-scoring reconstruction. */
case class PqReconstruct(child: Expression, cb: Array[Array[Double]], subDims: Int)
  extends PqExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def childTypeOk: Boolean = child.dataType match {
    case ArrayType(IntegerType, _) => true; case _ => false
  }
  override protected def childTypeWant: String = "array<int>"

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    val out = new Array[Double](cb(0).length)
    var m = 0
    while (m < nSub) {
      val row = cb(codes.getInt(m))
      var i = 0
      while (i < subDims) {
        out(m * subDims + i) = row(m * subDims + i)
        i += 1
      }
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      s"""
         |double[] $out = new double[${cb(0).length}];
         |for (int $m = 0; $m < $nSub; $m++) {
         |  double[] $row = $cbRef[$v.getInt($m)];
         |  for (int $i = 0; $i < $subDims; $i++) {
         |    $out[$m * $subDims + $i] = $row[$m * $subDims + $i];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqReconstruct = copy(child = c)
  override def prettyName: String = "pq_reconstruct"
}

object PqExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pqEncode(v: Column, cb: Array[Array[Double]], subDims: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), cb, subDims))

  def pqReconstruct(codes: Column, cb: Array[Array[Double]], subDims: Int): Column =
    ColumnBridge.column(PqReconstruct(ColumnBridge.expression(codes), cb, subDims))
}
