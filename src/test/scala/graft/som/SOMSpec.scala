package graft.som

import graft.SparkSpec
import org.apache.spark.ml.linalg.{Vector, Vectors}
import scala.util.Random

class SOMSpec extends SparkSpec {

  private def demoDF(n: Int = 2000, d: Int = 3, seed: Long = 7) = {
    // Seeded version of the reference's demo fixture (reference
    // `som/SOM.scala:409-413`): uniform random d-dim points.
    val rnd = new Random(seed)
    val rows = Seq.fill(n)((0.0, Vectors.dense(Array.fill(d)(rnd.nextDouble()))))
    import spark.implicits._
    rows.toDF("label", "features")
  }

  test("findClosest equals naive argmin with min-index tie-break") {
    val rnd = new Random(1)
    val protos = Array.fill(25)(Vectors.dense(Array.fill(8)(rnd.nextDouble())))
      .map(v => VectorWithNorm(v, Vectors.norm(v, 2.0)))
    for (_ <- 0 until 200) {
      val p = Vectors.dense(Array.fill(8)(rnd.nextDouble()))
      val pw = VectorWithNorm(p, Vectors.norm(p, 2.0))
      val (bmu, d2) = Distance.findClosest(protos, pw)
      val naive = protos.map(c => Vectors.sqdist(c.vector, p)).zipWithIndex.minBy { case (d, i) => (d, i) }
      assert(bmu == naive._2)
      assert(math.abs(d2 - naive._1) < 1e-12)
    }
    // exact tie: duplicate prototypes -> lowest index wins
    val dup = Array(protos(3), protos(3), protos(3))
    assert(Distance.findClosest(dup, protos(3))._1 == 0)
  }

  test("fit produces a full grid model with decreasing-ish objective") {
    val df = demoDF()
    // Mild temperatures: with a cooled schedule the quantization error must
    // improve on the random init. (With large tMax the early wide-neighborhood
    // iterations legitimately *raise* quantization error — topology first.)
    val som = new SOM().setHeight(3).setWidth(3).setMaxIter(15)
      .setTMax(2.0).setTMin(0.5).setSeed(42)
    val model = som.fit(df)
    assert(model.prototypes.length == 9)
    assert(model.hasSummary)
    val hist = model.objectiveHistory
    assert(hist.nonEmpty && hist.length <= 15)
    assert(hist.forall(_ > 0))
    assert(hist.last < hist.head)
    assert(model.summary.numIter == hist.length)
  }

  test("hexagonal topology trains and differs from rectangular") {
    val df = demoDF()
    def fitWith(topo: String) = new SOM().setHeight(3).setWidth(3).setMaxIter(8)
      .setTMax(2.0).setTMin(0.5).setSeed(42).setTopology(topo).fit(df)
    val hex = fitWith("hexagonal")
    val rect = fitWith("rectangular")
    assert(hex.prototypes.length == 9)
    assert(hex.objectiveHistory.last < hex.objectiveHistory.head)
    // same seed/init, different neighborhood metric -> different maps
    assert(hex.prototypes.zip(rect.prototypes)
      .exists { case (a, b) => Vectors.sqdist(a, b) > 0.0 })
    intercept[IllegalArgumentException](new SOM().setTopology("toroidal"))
  }

  test("fit is deterministic for a fixed seed") {
    val df = demoDF()
    val m1 = new SOM().setHeight(3).setWidth(3).setMaxIter(5).setSeed(42).fit(df)
    val m2 = new SOM().setHeight(3).setWidth(3).setMaxIter(5).setSeed(42).fit(df)
    m1.prototypes.zip(m2.prototypes).foreach { case (a, b) =>
      assert(Vectors.sqdist(a, b) == 0.0)
    }
  }

  test("transform appends an IntegerType prediction in [0, K)") {
    val df = demoDF(500)
    val model = new SOM().setHeight(3).setWidth(4).setMaxIter(3).setSeed(1).fit(df)
    val out = model.transform(df)
    assert(out.columns.toSeq == Seq("label", "features", "prediction"))
    assert(out.schema("prediction").dataType == org.apache.spark.sql.types.IntegerType)
    val preds = out.select("prediction").distinct().collect().map(_.getInt(0))
    assert(preds.forall(p => p >= 0 && p < 12))
  }

  test("transform refuses an existing prediction column") {
    val df = demoDF(50).withColumnRenamed("label", "prediction")
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(1).setSeed(1).fit(demoDF(50))
    intercept[IllegalArgumentException](model.transform(df))
  }

  test("computeCost equals sum of per-point min squared distances") {
    val df = demoDF(300)
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(3).setSeed(5).fit(df)
    val cost = model.computeCost(df)
    val protos = model.prototypes
    val naive = df.select("features").collect().map { r =>
      val v = r.getAs[Vector](0)
      protos.map(c => Vectors.sqdist(c, v)).min
    }.sum
    assert(math.abs(cost - naive) / naive < 1e-9)
    assert(cost >= 0)
  }

  test("maxIter=0 skips training and keeps the sampled init (reference edge)") {
    val df = demoDF(100)
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(0).setSeed(9).fit(df)
    assert(model.prototypes.length == 4)
    assert(model.objectiveHistory.isEmpty)
  }

  test("warm start via setInitialModel reuses prototypes") {
    val df = demoDF(200)
    val m0 = new SOM().setHeight(2).setWidth(2).setMaxIter(2).setSeed(3).fit(df)
    val m1 = new SOM().setHeight(2).setWidth(2).setMaxIter(0).setInitialModel(m0).fit(df)
    m0.prototypes.zip(m1.prototypes).foreach { case (a, b) => assert(Vectors.sqdist(a, b) == 0.0) }
    // grid-size mismatch is rejected (reference bug fixed, SURVEY §7.3.2)
    intercept[IllegalArgumentException](new SOM().setHeight(3).setWidth(3).setInitialModel(m0))
  }

  test("array<float> and array<double> feature columns work end-to-end") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .withColumnRenamed("embedding", "features")
    val model = new SOM().setHeight(3).setWidth(3).setMaxIter(3).setSeed(11).fit(emb)
    val out = model.transform(emb)
    assert(out.where(org.apache.spark.sql.functions.col("prediction").isNotNull).count() == emb.count())
    val cost = model.computeCost(emb)
    assert(cost > 0)
  }

  test("model save/load round-trips prototypes") {
    val df = demoDF(100)
    val m = new SOM().setHeight(2).setWidth(3).setMaxIter(2).setSeed(4).fit(df)
    val path = java.nio.file.Files.createTempDirectory("sommodel").toString + "/m"
    m.save(spark, path)
    val loaded = SOMModel.load(spark, path)
    assert(loaded.getHeight == 2 && loaded.getWidth == 3)
    m.prototypes.zip(loaded.prototypes).foreach { case (a, b) => assert(Vectors.sqdist(a, b) == 0.0) }
  }

  test("VectorAssembler -> SOM pipeline clusters TPC-H numerics end-to-end") {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount"))
        .setOutputCol("features"),
      new SOM().setHeight(3).setWidth(3).setMaxIter(3).setSeed(2)))
    val out = pipe.fit(li).transform(li)
    assert(out.count() == li.count())
    assert(out.select("prediction").distinct().count() > 1)
  }

  test("SOM composes into an org.apache.spark.ml.Pipeline") {
    import org.apache.spark.ml.Pipeline
    val df = demoDF(300)
    val pipe = new Pipeline().setStages(Array(
      new SOM().setHeight(2).setWidth(2).setMaxIter(3).setSeed(21)))
    val model = pipe.fit(df)
    val out = model.transform(df)
    assert(out.columns.contains("prediction"))
    assert(out.count() == 300)
  }

  test("transformNative matches the UDF scoring path exactly on array features") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .withColumnRenamed("embedding", "features")
    val model = new SOM().setHeight(3).setWidth(3).setMaxIter(3).setSeed(11).fit(emb)
    val udfPath = model.transform(emb).select("vec_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nativePath = model.transformNative(emb).select("vec_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(udfPath == nativePath)
    // and the native plan is UDF-free
    val plan = model.transformNative(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("UDF("))
  }

  test("scoring a streaming DataFrame works (streaming model inference)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val df = demoDF(200)
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(2).setSeed(6).fit(df)
    val mem = MemoryStream[(Long, Array[Double])]
    val scored = model.setFeaturesCol("emb").setPredictionCol("cell")
      .transformNative(mem.toDF().toDF("id", "emb"))
    val q = scored.writeStream.format("memory").queryName("scored_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, Array(0.1, 0.2, 0.3)), (2L, Array(0.9, 0.8, 0.7)))
      q.processAllAvailable()
      val rows = spark.table("scored_out").collect()
      assert(rows.length == 2)
      assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 4))
    } finally {
      q.stop()
      model.setFeaturesCol("features").setPredictionCol("prediction")
    }
  }

  test("GraftExtensions registers SQL functions at session build") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared session/context creation first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder() // new session over the same context
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      assert(r.getDouble(0) == 11.0)
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("sparse feature vectors train and score (reference supports both shapes)") {
    import spark.implicits._
    val rnd = new Random(17)
    val rows = Seq.fill(300) {
      val idx = (0 until 10).filter(_ => rnd.nextBoolean()).toArray
      (0.0, Vectors.sparse(10, idx, idx.map(_ => rnd.nextDouble())).asInstanceOf[Vector])
    }
    val df = rows.toDF("label", "features")
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(3).setSeed(8).fit(df)
    assert(model.prototypes.length == 4)
    assert(model.transform(df).count() == 300)
    assert(model.computeCost(df) >= 0)
  }

  test("fit on an empty dataset fails with a clear message") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Vector)].toDF("label", "features")
    val e = intercept[IllegalArgumentException](
      new SOM().setHeight(2).setWidth(2).setMaxIter(1).fit(empty))
    assert(e.getMessage.contains("not enough data"))
  }

  test("param validators reject bad values") {
    intercept[IllegalArgumentException](new SOM().setHeight(1))
    intercept[IllegalArgumentException](new SOM().setKernel("triangular"))
    intercept[IllegalArgumentException](new SOM().setDecay("cosine"))
    intercept[IllegalArgumentException](new SOM().setTopology("triangular"))
    new SOM().setTopology("hexagonal") // extension: valid since round 2
    intercept[IllegalArgumentException](new SOM().setMaxIter(-1))
  }
}
