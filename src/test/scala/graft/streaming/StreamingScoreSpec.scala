package graft.streaming

import graft.SparkSpec
import graft.queries.SomQueries
import graft.som.SOMModel
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming SOM inference (VERDICT r2 stretch #8): a MemoryStream of
  * embeddings scored with `transformNative` against a SAVED-and-RELOADED
  * model must equal the batch `som_assign` assignment — which is itself
  * hash-matched against the DuckDB oracle every round, so the streaming
  * scoring path is transitively oracle-proven. `transformNative` is pure
  * codegen expressions (no UDF, no state), so it runs under Structured
  * Streaming unchanged; this pins that claim to real sf0.001 data.
  */
class StreamingScoreSpec extends SparkSpec {

  case class Emb(vec_id: Long, embedding: Array[Double])

  test("streaming transformNative on a saved model equals batch som_assign") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = sf("sf0.001")

    // the same fixed 3×3 prototype table som_assign uses (embeddings vec_id<9)
    val protos = SomQueries.protos(spark, dir).orderBy("proto_id").collect()
      .map(r => Vectors.dense(r.getAs[Seq[Double]]("c").toArray))
    val path = java.nio.file.Files.createTempDirectory("som_stream").toString + "/model"
    new SOMModel("som_stream", protos).setGrid(3, 3)
      .setFeaturesCol("embedding").setPredictionCol("prediction")
      .write.overwrite().save(path)
    val model = SOMModel.load(path)

    val batch = SomQueries.points(spark, dir)
      .select(col("vec_id").cast("long"), col("v"))
      .collect().map(r => Emb(r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

    val mem = MemoryStream[Emb]
    val q = model.transformNative(mem.toDF())
      .select(col("vec_id"), col("prediction"))
      .writeStream.format("memory").queryName("stream_scores")
      .outputMode("append").start()
    try {
      mem.addData(batch)
      q.processAllAvailable()
      val streamed = spark.table("stream_scores").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val expected = SomQueries.assign(spark, dir)
        .select(col("vec_id").cast("long"), col("bmu").cast("int"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed.size == expected.size && streamed.nonEmpty)
      assert(streamed == expected,
        s"${streamed.count { case (k, v) => expected(k) != v }} scores differ")
    } finally q.stop()
  }
}
