package graft.sources

import graft.SparkSpec
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Incremental IVF layout maintenance (ann_ivf_delta): the delta append must
  * (a) never touch yesterday's files, (b) land new files only in the delta's
  * cells, and (c) be invisible to the probe path — served results equal the
  * full-rebuild layout's. */
class IvfDeltaSpec extends SparkSpec {

  /** (relative path → bytes) for every parquet data file under `root`. */
  private def dataFiles(root: Path): Map[String, Seq[Byte]] =
    Using.resource(Files.walk(root)) { st =>
      st.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .map(p => root.relativize(p).toString -> Files.readAllBytes(p).toSeq)
        .toMap
    }

  test("append leaves base files byte-identical; new files land only in delta cells") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_ivf_delta")
    val base = (0L until 16L).map(i => (i, Array.fill(4)(i.toDouble), i % 4))
      .toDF("vec_id", "v", "cell")
    val delta = (16L until 20L).map(i => (i, Array.fill(4)(i.toDouble), i % 2))
      .toDF("vec_id", "v", "cell") // delta touches cells 0 and 1 only
    Sources.writeIvfLayout(base, root.toString)
    val before = dataFiles(root)
    Sources.appendIvfLayout(delta, root.toString)
    val after = dataFiles(root)
    // every base file survives byte-identical — no rewrite, no rebalance
    before.foreach { case (rel, bytes) =>
      assert(after.get(rel).contains(bytes), s"base file $rel changed by append")
    }
    // new files appear ONLY under the delta's cell directories
    val added = after.keySet -- before.keySet
    assert(added.nonEmpty)
    assert(added.forall(p => p.startsWith("cell=0/") || p.startsWith("cell=1/")),
      s"delta files outside delta cells: $added")
    // the layout now serves base ∪ delta exactly
    val got = spark.read.parquet(root.toString)
      .select("vec_id").as[Long].collect().toSet
    assert(got == (0L until 20L).toSet)
  }

  test("served top-k over the delta-appended layout equals the rebuilt layout") {
    val rebuilt = SimilarityQueries.annIvfPruned(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSet
    val delta = SimilarityQueries.annIvfDelta(spark, sf("sf0.001"))
      .collect().map(_.toSeq).toSet
    assert(delta == rebuilt) // the append seam is invisible to probes
  }

  test("repeat invocation serves from the cached layout without duplicating rows") {
    val n1 = SimilarityQueries.annIvfDelta(spark, sf("sf0.001")).count()
    val n2 = SimilarityQueries.annIvfDelta(spark, sf("sf0.001")).count()
    assert(n1 == n2) // a second append would double-count the delta
  }
}
