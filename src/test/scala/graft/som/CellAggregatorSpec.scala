package graft.som

import graft.SparkSpec
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

class CellAggregatorSpec extends SparkSpec {

  test("typed Aggregator matches Summarizer-based per-cell sums/counts/cost") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val data = Seq.fill(500)((rnd.nextInt(4), Vectors.dense(Array.fill(3)(rnd.nextDouble())), rnd.nextDouble()))
      .toDF("bmu", "f", "d2")

    // Aggregator path (UDAF shape)
    val agg = new CellAggregator(3).toColumn
    val typed = data.as[(Int, Vector, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, v, d2) => (v, d2) }
      .agg(agg)
      .collect().map { case (cell, (sum, n, cost)) => cell -> (sum, n, cost) }.toMap

    // Summarizer path (what SOM.fit uses)
    val summ = data.groupBy("bmu")
      .agg(org.apache.spark.ml.stat.Summarizer.sum(col("f")).as("s"),
        count(lit(1)).as("n"), sum(col("d2")).as("cost"))
      .collect().map(r => r.getInt(0) -> (r.getAs[Vector](1), r.getLong(2), r.getDouble(3))).toMap

    assert(typed.keySet == summ.keySet)
    typed.foreach { case (cell, (sv, n, cost)) =>
      val (sv2, n2, cost2) = summ(cell)
      assert(n == n2)
      assert(Vectors.sqdist(sv, sv2) < 1e-18)
      assert(math.abs(cost - cost2) < 1e-12)
    }
  }
}
