package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot text kernels (tokenize, 3-gram
  * shingle, rolling hash). The declarative forms run through higher-order
  * functions (CodegenFallback — interpreted per element) and the round-1/2
  * workaround was JIT Scala UDFs (compiled, but a serialization barrier:
  * UTF8String→String→Array→ArrayData per row, and a codegen fence in the
  * plan). These expressions work on [[UTF8String]] bytes in place and
  * generate a single static call into whole-stage codegen — same outputs,
  * no conversion, no fence (the `StaticInvoke` pattern Spark uses for its
  * own object-level kernels).
  *
  * Null semantics replicate the declarative originals exactly:
  * tokens(null) = [], shingles3(null) = [null], rollingHash(null|"") = 0.
  */
object TextExpressions {

  /** Whitespace (0x20) tokens, empties dropped. Space is a single byte in
    * UTF-8 and never a continuation byte, so byte scanning is char-safe. */
  def tokenize(s: UTF8String): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val b = s.getBytes
    val out = new java.util.ArrayList[AnyRef]()
    var start = 0
    var p = 0
    while (p <= b.length) {
      if (p == b.length || b(p) == 0x20.toByte) {
        if (p > start) out.add(UTF8String.fromBytes(b, start, p - start))
        start = p + 1
      }
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** 3-token shingles joined by single spaces; the whole text when fewer
    * than 3 tokens (including the null/empty cases). */
  def shingles3(s: UTF8String): GenericArrayData = shinglesN(s, 3)

  /** Width-N token shingles (same semantics as [[shingles3]] generalized):
    * the whole text when fewer than N tokens, null element for null input.
    * Production decontamination runs N=13 (the benchmark-overlap standard);
    * the dedup family's near-dup signals run N=3. */
  def shinglesN(s: UTF8String, width: Int): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array[Any](null))
    val toks = tokenize(s)
    val n = toks.numElements()
    if (n < width) return new GenericArrayData(Array[Any](s))
    val space = UTF8String.fromString(" ")
    val out = new Array[Any](n - width + 1)
    var i = 0
    while (i < n - width + 1) {
      val parts = new Array[UTF8String](2 * width - 1)
      var j = 0
      while (j < width) {
        parts(2 * j) = toks.getUTF8String(i + j)
        if (j < width - 1) parts(2 * j + 1) = space
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial rolling hash over Unicode codepoints: h ← (h·31 + c) mod
    * (10⁹+7), seeded with the first codepoint; null/empty ⇒ 0. Decodes the
    * UTF-8 bytes directly (UTF8String is always valid UTF-8), producing the
    * same codepoint stream as `String.codePoints()`. */
  def rollingHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val b = s.getBytes
    if (b.length == 0) return 0L
    var h = 0L
    var first = true
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      var c = 0
      var n = 1
      if (x < 0x80) { c = x }
      else if ((x & 0xE0) == 0xC0) { c = x & 0x1F; n = 2 }
      else if ((x & 0xF0) == 0xE0) { c = x & 0x0F; n = 3 }
      else { c = x & 0x07; n = 4 }
      var j = 1
      while (j < n) { c = (c << 6) | (b(i + j) & 0x3F); j += 1 }
      if (first) { h = c.toLong; first = false }
      else h = (h * 31 + c) % 1000000007L
      i += n
    }
    h
  }

  /** Unicode NFC canonical composition ("e" + U+0301 → "é"): the first step
    * of the text-normalization hygiene pass. Fast path: a pure-ASCII string
    * (the overwhelming majority at corpus scale) is returned AS-IS after one
    * byte scan — no String round-trip, no Normalizer call (ASCII is closed
    * under NFC). Otherwise delegates to `java.text.Normalizer` (the JDK's
    * Unicode-standard canonical composition — the same algorithm DuckDB's
    * utf8proc `nfc_normalize` implements, which is what makes the pass
    * oracle-checkable). null → empty, matching the kernel family's
    * never-null-out contract. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    if (s == null) return UTF8String.EMPTY_UTF8
    val b = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < b.length) { if (b(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Non-overlapping fixed-width word segments (stride = width twin of
    * shinglesN's stride-1 windows): segment k covers tokens
    * [k·width, k·width+width), last segment may be shorter; empty/null
    * text → empty array. One pass over the tokens — the higher-order
    * `transform(sequence, i -> slice(tokens, ...))` formulation re-inlines
    * the whole split+filter chain into EVERY lambda element (Spark runs no
    * subexpression elimination inside lambdas), which is quadratic per doc
    * and measured 16 s on dedup_paragraph at sf0.1 vs <1 s for this
    * kernel. */
  def segmentsN(s: UTF8String, width: Int): GenericArrayData = {
    if (s == null) return new GenericArrayData(Array.empty[Any])
    val toks = tokenize(s)
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val nSeg = (n + width - 1) / width
    val out = new Array[Any](nSeg)
    var k = 0
    while (k < nSeg) {
      val start = k * width
      val len = math.min(width, n - start)
      val parts = new Array[UTF8String](2 * len - 1)
      var j = 0
      while (j < len) {
        parts(2 * j) = toks.getUTF8String(start + j)
        if (j < len - 1) parts(2 * j + 1) = space
        j += 1
      }
      out(k) = UTF8String.concat(parts: _*)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Static kernel for the portable 60-bit content hash: the top 15 hex
  * digits of md5 as a non-negative long — numerically identical to the
  * declarative `conv(substring(md5(s), 1, 15), 16, 10)` (and the oracle's
  * `('0x' || substr(md5(s),1,15))::BIGINT`) but computed from the digest
  * bytes directly: no 32-char hex string, no substring, no base-10 string
  * from `conv` — three allocations per hashed shingle gone. */
object HashKernels {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def md5Prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    // first 15 hex digits == top 60 bits of the big-endian digest
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xFF); i += 1 }
    v >>> 4
  }
}

/** 60-bit md5-prefix hash (long, null-propagating). */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    HashKernels.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.md5Prefix60($c)")

  override protected def withNewChildInternal(c: Expression): Md5Prefix60 = copy(c)
  override def prettyName: String = "md5_prefix60"
}

/** Shared shape: string-in, never-null-out, result produced by one static
  * call (interpreted eval and codegen both route through the same helper,
  * so the two paths cannot diverge). */
abstract class TextKernelExpression extends UnaryExpression {
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  /** Fully-qualified static helper the kernel compiles to. */
  protected def helper: String
  protected def evalKernel(s: UTF8String): Any

  override def eval(input: InternalRow): Any =
    evalKernel(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = $helper(${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }
}

/** Space-tokenization: `array<string>` of non-empty tokens. */
case class SpaceTokens(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def helper: String = "graft.functions.TextExpressions.tokenize"
  override protected def evalKernel(s: UTF8String): Any = TextExpressions.tokenize(s)
  override protected def withNewChildInternal(c: Expression): SpaceTokens = copy(c)
  override def prettyName: String = "space_tokens"
}

/** 3-gram shingles (whole text when short — may contain a null element for
  * null input, mirroring the declarative `array(text)` branch). */
case class Shingles3(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def helper: String = "graft.functions.TextExpressions.shingles3"
  override protected def evalKernel(s: UTF8String): Any = TextExpressions.shingles3(s)
  override protected def withNewChildInternal(c: Expression): Shingles3 = copy(c)
  override def prettyName: String = "shingles3"
}

/** Width-N token shingles (the 13-gram decontamination path; N is a plan
  * literal, so codegen bakes it into the static call). */
case class ShinglesN(child: Expression, width: Int) extends TextKernelExpression {
  require(width >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def helper: String = "graft.functions.TextExpressions.shinglesN"
  override protected def evalKernel(s: UTF8String): Any =
    TextExpressions.shinglesN(s, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = $helper(${c.isNull} ? null : ${c.value}, $width);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): ShinglesN =
    copy(child = c)
  override def prettyName: String = "shingles_n"
}

/** Codegen kernel for [[TextExpressions.segmentsN]] — fixed-width
  * NON-overlapping word segments in one tokenize pass. */
case class SegmentsN(child: Expression, width: Int) extends TextKernelExpression {
  require(width >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override protected def helper: String = "graft.functions.TextExpressions.segmentsN"
  override protected def evalKernel(s: UTF8String): Any =
    TextExpressions.segmentsN(s, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        $javaType ${ev.value} = $helper(${c.isNull} ? null : ${c.value}, $width);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): SegmentsN =
    copy(child = c)
  override def prettyName: String = "segments_n"
}

/** Codegen kernel for [[TextExpressions.nfcNormalize]] — Unicode NFC with
  * an in-place ASCII fast path. */
case class NfcNormalize(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = StringType
  override protected def helper: String = "graft.functions.TextExpressions.nfcNormalize"
  override protected def evalKernel(s: UTF8String): Any = TextExpressions.nfcNormalize(s)
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(c)
  override def prettyName: String = "nfc_normalize"
}

/** Polynomial rolling hash (long). */
case class RollingHash(child: Expression) extends TextKernelExpression {
  override def dataType: DataType = LongType
  override protected def helper: String = "graft.functions.TextExpressions.rollingHash"
  override protected def evalKernel(s: UTF8String): Any = TextExpressions.rollingHash(s)
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
  override def prettyName: String = "rolling_hash"
}

object TextKernels {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def spaceTokens(text: Column): Column =
    ColumnBridge.column(SpaceTokens(ColumnBridge.expression(text)))
  def shingles3(text: Column): Column =
    ColumnBridge.column(Shingles3(ColumnBridge.expression(text)))
  def shinglesN(text: Column, width: Int): Column =
    ColumnBridge.column(ShinglesN(ColumnBridge.expression(text), width))
  def segmentsN(text: Column, width: Int): Column =
    ColumnBridge.column(SegmentsN(ColumnBridge.expression(text), width))
  def rollingHash(text: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(text)))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def md5Prefix60(text: Column): Column =
    ColumnBridge.column(Md5Prefix60(ColumnBridge.expression(text)))
}
