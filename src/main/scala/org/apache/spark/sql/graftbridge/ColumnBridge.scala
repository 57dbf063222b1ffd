package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(Expression)` constructor (Column is
  * now backend-agnostic); the classic-backend converters live behind
  * `private[sql]`. This bridge — placed inside the `org.apache.spark.sql`
  * namespace, the established pattern for libraries extending Spark with
  * custom Catalyst expressions — re-exports just the two converters the
  * `graft.functions` expressions need. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a SQL function on an existing
    * session (the runtime sibling of `SparkSessionExtensions.injectFunction`,
    * for sessions we did not create). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
