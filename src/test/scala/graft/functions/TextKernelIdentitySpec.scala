package graft.functions

import graft.SparkSpec
import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Output identity of the native text kernels against (a) the declarative
  * higher-order-function forms they replace in hot paths and (b) plain Scala
  * reference implementations — on adversarial inputs: nulls, empties, runs
  * of spaces, multi-byte UTF-8 (2/3/4-byte sequences incl. surrogate-pair
  * codepoints). Both the interpreted `eval` and the codegen path route
  * through the same static helper, and the DataFrame runs exercise codegen.
  */
class TextKernelIdentitySpec extends SparkSpec {

  private val cases: Seq[String] = Seq(
    null, "", " ", "   ", "a", "a b", "a b c", "a b c d e",
    "  leading", "trailing  ", "  both  ", "a  double  space",
    "héllo wörld déjà vu über alles", // 2-byte sequences
    "的 是 了 在 我 他", // 3-byte sequences
    "emoji 😀 pair 🚀 end", // 4-byte (surrogate pairs)
    "mixed 的ascii héllo😀tail x y z")

  private def df = {
    import spark.implicits._
    cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("spaceTokens == declarative tokens on every case") {
    val rows = df.select(col("id"), TextOps.tokens(col("text")).as("a"),
      TextOps.tokensFast(col("text")).as("b")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getLong(0)}")
    }
  }

  test("shingles3 == declarative shingles3 on every case") {
    val rows = df.select(col("id"), TextOps.shingles3(col("text")).as("a"),
      TextOps.shingles3Fast(col("text")).as("b")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getLong(0)}")
    }
  }

  test("segmentsN == declarative sequence/slice segments on every case") {
    // the declarative twin segmentsN replaced (kept here as the spec oracle)
    def declarative(width: Int) = {
      val t = TextOps.tokens(col("text"))
      when(size(t) === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), ((size(t) + (width - 1)) / width).cast("int") - 1),
          i => array_join(slice(t, i * width + 1, lit(width)), " ")))
    }
    for (w <- Seq(1, 2, 3, 5)) {
      val rows = df.select(col("id"), declarative(w).as("a"),
        TextKernels.segmentsN(col("text"), w).as("b")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"width $w case ${r.getLong(0)}")
      }
    }
  }

  test("shinglesN: width 3 == shingles3; width semantics on every case") {
    val rows = df.select(col("id"), TextOps.shingles3Fast(col("text")).as("a"),
      TextOps.shinglesNFast(col("text"), 3).as("b"),
      TextOps.tokensFast(col("text")).as("t"),
      TextOps.shinglesNFast(col("text"), 5).as("c")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getLong(0)}")
      val toks = r.getSeq[String](3)
      val five = r.getSeq[String](4)
      if (toks.size < 5) {
        val t = cases(r.getLong(0).toInt)
        assert(five == Seq(t), s"case ${r.getLong(0)}: short text passes whole")
      } else {
        assert(five.size == toks.size - 4, s"case ${r.getLong(0)}")
        assert(five.head == toks.take(5).mkString(" "), s"case ${r.getLong(0)}")
        assert(five.last == toks.takeRight(5).mkString(" "), s"case ${r.getLong(0)}")
      }
    }
  }

  test("rollingHash matches a String.codePoints reference on every case") {
    def ref(text: String): Long =
      if (text == null || text.isEmpty) 0L
      else {
        val it = text.codePoints().iterator()
        var h = it.next().toLong
        while (it.hasNext) h = (h * 31 + it.next()) % TextOps.RollP
        h
      }
    val rows = df.select(col("id"), col("text"), TextOps.rollingHash(col("text")).as("h"))
      .collect()
    rows.foreach { r =>
      val t = if (r.isNullAt(1)) null else r.getString(1)
      assert(r.getLong(2) == ref(t), s"case ${r.getLong(0)}: '$t'")
    }
  }

  test("md5Prefix60 == declarative conv(substring(md5)) on every case") {
    val rows = df.select(col("id"),
      VectorSql.md5Hash60Declarative(col("text")).as("a"),
      TextKernels.md5Prefix60(col("text")).as("b")).collect()
    rows.foreach { r =>
      val a = if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))
      val b = if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2))
      assert(a == b, s"case ${r.getLong(0)}")
      if (b != null) assert(b >= 0L && b < (1L << 60))
    }
  }

  test("interpreted eval agrees with the static helpers (no codegen)") {
    // direct helper calls — the same code eval() and doGenCode() route to
    val s = UTF8String.fromString("a b c d")
    assert(TextExpressions.tokenize(s).numElements() == 4)
    assert(TextExpressions.shingles3(s).numElements() == 2)
    assert(TextExpressions.tokenize(null).numElements() == 0)
    assert(TextExpressions.shingles3(null).array.toSeq == Seq(null))
    assert(TextExpressions.rollingHash(null) == 0L)
    assert(TextExpressions.rollingHash(UTF8String.fromString("")) == 0L)
  }
}
