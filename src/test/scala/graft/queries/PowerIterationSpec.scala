package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ml_top_direction: power iteration must find a planted dominant axis
  * through the int8 lattice. */
class PowerIterationSpec extends SparkSpec {

  test("recovers a planted dominant axis (sign-agnostic) at full unit magnitude") {
    import spark.implicits._
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("powit").toString
    // energy concentrated on dim 7 (alternating sign so the mean is ~0 and
    // only the second moment carries the signal). The noise must VARY in
    // magnitude across vectors: quantization rescales every dim by its own
    // max, so constant-magnitude noise would hit the same ±127 codes as
    // the planted axis and erase the spectrum — only dims where most
    // vectors sit far below the dim's max stay quiet in code space.
    // one sequential stream — per-element Random(i*64+d) seeds are a known
    // java.util.Random pathology (near-identical first draws from nearby
    // seeds) that collapses all noise dims into one giant rank-1 component
    val rnd = new scala.util.Random(42)
    val rows = (0 until 60).map { i =>
      val v = Array.tabulate(64) { d =>
        val noise = rnd.nextFloat() - 0.5f
        if (d == 7) (if (i % 2 == 0) 10f else -10f) else noise
      }
      (i.toLong, v.toSeq, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
      .write.parquet(s"$tmp/embeddings.parquet")
    val x = MlQueries.mlTopDirection(spark, tmp)
      .as[(Int, Long)].collect().toMap
    val top = x.maxBy { case (_, c) => math.abs(c) }
    assert(top._1 == 7, s"dominant axis must be dim 7, got ${top._1}")
    assert(math.abs(top._2) == MlQueries.PowerUnit,
      "renormalized head component must sit at the unit")
    // the noise floor stays well below the planted axis
    x.filter(_._1 != 7).values.foreach(c =>
      assert(math.abs(c) < MlQueries.PowerUnit / 2, s"noise component $c too large"))
  }
}
