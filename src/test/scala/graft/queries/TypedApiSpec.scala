package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The typed Dataset[T] surface: case-class Encoders over the same tables,
  * proving the library's operations compose with the type-safe API (SURVEY
  * §3 names both surfaces). Typed aggregation here goes through
  * groupByKey + typed agg columns — NOT through row-by-row `.map` closures,
  * which would deserialize every row and break whole-stage codegen; the
  * assertion that typed == untyped keeps the typed path honest. */
// top-level: an inner case class would need an outer instance at encoder
// deserialization time (outerScopeFailureForNewInstanceError)
case class Li(l_suppkey: Long, l_quantity: Double, l_extendedprice: Double)

class TypedApiSpec extends SparkSpec {

  test("typed groupByKey aggregation equals the untyped groupBy exactly") {
    import spark.implicits._
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    val dir = sf("sf0.001")
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").cast("long"), col("l_quantity"), col("l_extendedprice"))
    val sumQty = new Aggregator[Li, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: Li): Long = b + a.l_quantity.toLong
      def merge(a: Long, b: Long): Long = a + b
      def finish(r: Long): Long = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }.toColumn.name("qty")
    val typedRes = raw.as[Li].groupByKey(_.l_suppkey)
      .agg(sumQty)
      .collect().toSet
    val untyped = raw.groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(typedRes.nonEmpty && typedRes == untyped)
  }

  test("typed filter/select pipeline equals the Column formulation") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_suppkey").cast("long"), col("l_quantity"), col("l_extendedprice"))
    val typed = raw.as[Li].filter(_.l_quantity > 40).count()
    val untyped = raw.where(col("l_quantity") > 40).count()
    assert(typed == untyped && typed > 0)
  }
}
