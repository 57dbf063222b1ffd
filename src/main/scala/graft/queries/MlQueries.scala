package graft.queries

import graft.som.{SOM, SOMModel, Distance, VectorWithNorm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries that exercise the full SOM Estimator/Model API end-to-end.
  * The iterative fit is not ANSI-expressible, so these get the driver's
  * weaker rows-only check — but they are made fully deterministic anyway:
  * warm-start init from the fixed prototype table (embeddings vec_id < 9)
  * removes all sampling.
  */
object MlQueries {

  /** Fit a 3×3 SOM on the embeddings table (warm-started from the fixed
    * prototypes), score the same table: (vec_id, prediction, cost-bearing
    * iteration count). */
  def somFitPredict(s: SparkSession, dir: String): DataFrame = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("features"))
    val init = SomQueries.protos(s, dir).orderBy("proto_id").collect()
      .map(r => org.apache.spark.ml.linalg.Vectors.dense(r.getAs[Seq[Double]]("c").toArray))
    val warm = new SOMModel("som_init", init).setGrid(3, 3)
    val model = new SOM().setHeight(3).setWidth(3)
      .setMaxIter(5).setTMax(2.0).setTMin(0.5).setSeed(42)
      .setInitialModel(warm)
      .fit(emb)
    model.transform(emb).select(col("vec_id"), col("prediction"))
  }

  /** Per-dimension z-score standardization of the embedding corpus — the
    * canonical feature-preprocessing pass (mean/std per dim over the whole
    * corpus, then normalize). Two aggregation passes + a broadcast join of
    * the 64-row stats table; at 100 TB the stats are a tiny
    * dimension-side. */
  def mlStandardize(s: SparkSession, dir: String): DataFrame = {
    val exploded = SomQueries.points(s, dir)
      .select(col("vec_id"), posexplode(col("v")).as(Seq("dim", "x")))
    val stats = exploded.groupBy(col("dim"))
      .agg(avg(col("x")).as("mu"), stddev_samp(col("x")).as("sigma"))
    exploded.join(broadcast(stats), "dim")
      .select(col("vec_id"), col("dim"),
        round((col("x") - col("mu")) / col("sigma"), 4).as("z"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "som_fit_predict" -> somFitPredict _,
    "ml_standardize" -> mlStandardize _,
  )

  val oracleSql: Map[String, String] = Map(
    "ml_standardize" ->
      """WITH ex AS (
        |  SELECT vec_id, CAST(i - 1 AS INT) AS dim, v[i] AS x FROM
        |  (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |          unnest(range(1, 65)) AS i
        |   FROM embeddings)),
        |stats AS (
        |  SELECT dim, avg(x) AS mu, stddev_samp(x) AS sigma FROM ex GROUP BY 1)
        |SELECT vec_id, dim, round((x - mu) / sigma, 4) AS z
        |FROM ex JOIN stats USING (dim)""".stripMargin,
  )
}
