package graft.som

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing per-cell (vector sum, count, cost sum) in one
  * pass — the UDAF-shaped alternative to the `groupBy(bmu).agg(Summarizer.sum,
  * count, sum)` form used by [[SOM.fit]] (SURVEY.md §7.2: replaces the
  * reference's hand-rolled mapPartitions+reduceByKey combiner,
  * reference `som/SOM.scala:192-212`). Buffer is a primitive double array:
  * [0..d) component sums, [d] count, [d+1] cost — merged associatively, so
  * Spark runs it as partial+final aggregation with map-side combine.
  */
class CellAggregator(dim: Int)
    extends Aggregator[(Vector, Double), Array[Double], (Vector, Long, Double)] {

  override def zero: Array[Double] = new Array[Double](dim + 2)

  override def reduce(buf: Array[Double], in: (Vector, Double)): Array[Double] = {
    val (v, d2) = in
    v match { // foreachNonZero is private[spark]; dispatch on the two shapes
      case d: org.apache.spark.ml.linalg.DenseVector =>
        var i = 0
        while (i < dim) { buf(i) += d.values(i); i += 1 }
      case s: org.apache.spark.ml.linalg.SparseVector =>
        val idx = s.indices; val vals = s.values
        var j = 0
        while (j < idx.length) { buf(idx(j)) += vals(j); j += 1 }
    }
    buf(dim) += 1.0
    buf(dim + 1) += d2
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): (Vector, Long, Double) =
    (Vectors.dense(java.util.Arrays.copyOfRange(buf, 0, dim)),
      buf(dim).toLong, buf(dim + 1))

  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[(Vector, Long, Double)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
