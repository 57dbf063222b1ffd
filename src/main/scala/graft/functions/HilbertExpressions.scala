package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Hilbert space-filling curve for 2-D data clustering — the successor to
  * the Morton/z-order interleave ([[graft.sources.Sources.writeZorderLayout]]):
  * unlike Morton, CONSECUTIVE Hilbert positions are always spatially
  * adjacent (no "jumps" across the grid), so a 2-D box decomposes into
  * fewer contiguous curve-index runs — the property that matters when data
  * skipping rides sorted-key ranges (file min/max zone maps) rather than
  * exact partition values. Production table formats offer exactly this
  * switch (OPTIMIZE ... ZORDER vs Hilbert clustering).
  *
  * One shared integer algorithm (the standard xy2d quadrant-rotation walk)
  * in three forms with pinned identity: a driver-side function (layout
  * planning), an interpreted `eval`, and whole-stage-codegen Java — all
  * exact integer math, so there is nothing float to diverge.
  */
object Hilbert {

  /** Cell (x, y) on the 2^bits × 2^bits grid → Hilbert position
    * d ∈ [0, 4^bits). Standard xy2d: walk the bit planes high→low,
    * accumulate the quadrant's sub-square offset, rotate/flip the frame. */
  def xy2d(bits: Int, x0: Int, y0: Int): Int = {
    var x = x0; var y = y0; var d = 0
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Decompose the cell box [loX,hiX]×[loY,hiY] into the SORTED list of
    * contiguous Hilbert-index runs it covers — the driver-side query
    * planner for a Hilbert-clustered layout (runs become key-range
    * predicates; their count is the skipping quality measure). Cost is the
    * box's cell count — bounded by 4^bits, driver metadata scale. */
  def boxRuns(bits: Int, loX: Int, hiX: Int, loY: Int, hiY: Int): Seq[(Int, Int)] = {
    val ds = (for { x <- loX to hiX; y <- loY to hiY } yield xy2d(bits, x, y))
      .sorted
    if (ds.isEmpty) return Seq.empty
    val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var start = ds.head; var prev = ds.head
    for (d <- ds.tail) {
      if (d != prev + 1) { runs += ((start, prev)); start = d }
      prev = d
    }
    runs += ((start, prev))
    runs.toSeq
  }

  /** `hilbert_index(x, y)` as a Column (codegen'd, no UDF barrier). */
  def index(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}

/** Codegen Hilbert xy2d over two int cell-id columns. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 15, s"bits must be in [1, 15], got $bits")
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two int arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(xv: Any, yv: Any): Any =
    Hilbert.xy2d(bits, xv.asInstanceOf[Int], yv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      // the same integer walk as Hilbert.xy2d, inlined into the stage
      s"""
         |int $x = $a; int $y = $b; int $d = 0;
         |for (int $s = ${1 << (bits - 1)}; $s > 0; $s >>= 1) {
         |  int $rx = (($x & $s) > 0) ? 1 : 0;
         |  int $ry = (($y & $s) > 0) ? 1 : 0;
         |  $d += $s * $s * ((3 * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    int $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
  override def prettyName: String = "hilbert_index"
}
