package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

class VectorSqlSpec extends SparkSpec {

  private def pairs(n: Int, d: Int) = {
    val rnd = new Random(99)
    import spark.implicits._
    (0 until n).map(i =>
      (i, Array.fill(d)(rnd.nextDouble() * 2 - 1), Array.fill(d)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "a", "b")
  }

  test("native codegen dot/sqdist are bit-identical to the declarative fold") {
    val df = pairs(500, 64)
    val out = df.select(
      VectorSql.dot(col("a"), col("b")).as("dot_hof"),
      VectorSql.dotFast(col("a"), col("b")).as("dot_native"),
      VectorSql.sqDist(col("a"), col("b")).as("sq_hof"),
      VectorSql.sqDistFast(col("a"), col("b")).as("sq_native")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot mismatch")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), "sqdist mismatch")
    }
  }

  test("native expressions survive codegen inside joins and filters") {
    val df = pairs(50, 8)
    val joined = df.as("x").crossJoin(df.as("y"))
      .where(VectorSql.sqDistFast(col("x.a"), col("y.a")) < 100.0)
    assert(joined.count() == 2500)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BatchEvalPython"))
  }

  test("type check rejects non-array<double> inputs") {
    import spark.implicits._
    val bad = Seq((1, "x")).toDF("i", "s")
    val e = intercept[Exception] {
      bad.select(VectorSql.dotFast(col("s"), col("s"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }

  test("null arrays yield null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]])).toDF("a", "b")
    val r = df.select(VectorSql.dotFast(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("md5Hash60 is non-negative, stable, below 2^60") {
    import spark.implicits._
    val h = Seq("a", "b", "a").toDF("s")
      .select(VectorSql.md5Hash60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(h(0) == h(2) && h(0) != h(1))
    assert(h.forall(x => x >= 0 && x < (1L << 60)))
  }
}
