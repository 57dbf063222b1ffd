package graft.som

import org.apache.spark.sql.DataFrame

/** Training metadata holder (reference `som/SOMTrainingSummary.scala:5-18`):
  * the scored training set plus hyper-params, final cost and per-iteration
  * objective history ("in order to check convergence", reference
  * `README.md:39-46`). `predictions` is lazy — computed at first action. */
class SOMTrainingSummary(
    val predictions: DataFrame,
    val featuresCol: String,
    val predictionCol: String,
    val height: Int,
    val width: Int,
    val maxIter: Int,
    val numIter: Int,
    val cost: Double,
    val objectiveHistory: Array[Double])
