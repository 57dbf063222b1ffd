package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation patterns. At 100 TB a single hot key (one giant customer,
  * one ubiquitous shingle) turns a shuffle into one straggler task; salting
  * splits the hot key across `factor` partial groups and recombines.
  * The result is IDENTICAL to the unsalted plan (sums/counts are associative)
  * — which is why the salted queries can still be DuckDB-oracle-checked
  * against the plain GROUP BY.
  */
object Salting {

  /** Two-phase salted aggregation: groupBy(key, salt) partial sums, then
    * groupBy(key) final sums. `saltExpr` must be deterministic (e.g.
    * `pmod(hash-ish of another column), factor)`) so retries are exact.
    *
    * @param aggs (inputCol → outputName) sum-aggregations to compute */
  def saltedSumAgg(df: DataFrame, key: String, saltExpr: Column,
                   aggs: Seq[(Column, String)], countName: Option[String] = None): DataFrame = {
    val phase1Aggs =
      aggs.map { case (c, n) => sum(c).as(n) } ++
        countName.map(n => count(lit(1)).as(n))
    val phase1 = df.groupBy(col(key), saltExpr.as("_salt"))
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      aggs.map { case (_, n) => sum(col(n)).as(n) } ++
        countName.map(n => sum(col(n)).cast("long").as(n))
    phase1.groupBy(col(key))
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted broadcast-replicated join for a skewed big side: replicate each
    * small-side row `factor` times, salt the big side deterministically, join
    * on (key, salt). Output rows are exactly those of the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int,
                 bigSaltSource: Column): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(bigSaltSource, lit(factor)).cast("int"))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(broadcast(replicatedSmall), Seq(key, "_salt")).drop("_salt")
  }
}
