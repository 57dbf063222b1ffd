package graft.som

import graft.SparkSpec
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.linalg.Vectors
import java.nio.file.Files
import scala.util.Random

/** ML-native persistence: SOM/SOMModel must round-trip through the standard
  * Pipeline.save/load machinery (the reference cannot save models at all —
  * reference `README.md:91` lists persistence as an unshipped to-do). */
class PersistenceSpec extends SparkSpec {

  private def demoDF(n: Int = 500, d: Int = 3, seed: Long = 7) = {
    val rnd = new Random(seed)
    val rows = Seq.fill(n)((0.0, Vectors.dense(Array.fill(d)(rnd.nextDouble()))))
    import spark.implicits._
    rows.toDF("label", "features")
  }

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  test("fitted PipelineModel with SOM stage round-trips through save/load") {
    val df = demoDF()
    val som = new SOM().setHeight(3).setWidth(3).setMaxIter(3).setSeed(42)
      .setTMax(2.0).setTMin(0.5)
    val fitted = new Pipeline().setStages(Array(som)).fit(df)
    val path = tmp("som-pipe-model")
    fitted.write.overwrite().save(path)
    val loaded = PipelineModel.load(path)
    val m0 = fitted.stages(0).asInstanceOf[SOMModel]
    val m1 = loaded.stages(0).asInstanceOf[SOMModel]
    assert(m1.uid == m0.uid)
    assert(m1.prototypes.length == m0.prototypes.length)
    m0.prototypes.zip(m1.prototypes).foreach { case (a, b) =>
      assert(Vectors.sqdist(a, b) == 0.0)
    }
    // params survive: grid dims + feature/prediction cols
    assert(m1.getOrDefault(m1.height) == 3 && m1.getOrDefault(m1.width) == 3)
    // scoring is identical through the loaded pipeline
    val got0 = fitted.transform(df).select("prediction").collect().map(_.getInt(0))
    val got1 = loaded.transform(df).select("prediction").collect().map(_.getInt(0))
    assert(got0.sameElements(got1))
  }

  test("unfitted Pipeline with SOM stage round-trips params") {
    val som = new SOM().setHeight(4).setWidth(5).setMaxIter(7).setSeed(11)
    val path = tmp("som-pipe")
    new Pipeline().setStages(Array(som)).write.overwrite().save(path)
    val loaded = Pipeline.load(path).getStages(0).asInstanceOf[SOM]
    assert(loaded.uid == som.uid)
    assert(loaded.getOrDefault(loaded.height) == 4)
    assert(loaded.getOrDefault(loaded.width) == 5)
    assert(loaded.getOrDefault(loaded.maxIter) == 7)
    assert(loaded.getOrDefault(loaded.seed) == 11L)
  }

  test("bare SOMModel.write/read round-trips prototypes and params") {
    val model = new SOM().setHeight(2).setWidth(2).setMaxIter(2).setSeed(5)
      .fit(demoDF(200))
    val path = tmp("som-model")
    model.write.overwrite().save(path)
    val loaded = SOMModel.load(path)
    assert(loaded.uid == model.uid)
    model.prototypes.zip(loaded.prototypes).foreach { case (a, b) =>
      assert(Vectors.sqdist(a, b) == 0.0)
    }
    assert(loaded.predict(model.prototypes(3)) == 3)
  }
}
