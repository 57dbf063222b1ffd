package graft.som

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import scala.util.Random

/** Runnable twin of the reference's demo/benchmark harness (reference
  * `som/SOM.scala:394-431`): N=10,000 uniform-random 3-d points, 10×10 map,
  * maxIter=100 — but seeded, so runs are reproducible. Prints cost, history
  * length and wall time (the BASELINE.md "smoke sanity" figure). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new Random(42)
    val df = Seq.fill(10000)((0.0, Vectors.dense(Array.fill(3)(rnd.nextDouble()))))
      .toDF("label", "features")

    val t0 = System.nanoTime()
    val model = new SOM()
      .setHeight(10).setWidth(10)
      .setMaxIter(100).setSeed(42)
      .fit(df)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val cost = model.cost
    println(f"SOM demo: fit ${fitSec}%.1f s, iters=${model.summary.numIter}, " +
      f"final cost=$cost%.4f, first cost=${model.objectiveHistory.head}%.4f")
    println(s"predictions: ${model.summary.predictions.groupBy("prediction").count().count()} distinct cells used")
    spark.stop()
  }
}
