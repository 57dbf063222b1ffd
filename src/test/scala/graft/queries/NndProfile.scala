package graft.queries

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorSql.{norm2Fast, dotFast}

/** Scratch per-stage profiler for the NND build (deleted after tuning). */
object NndProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("nndprof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/target/sf10")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - s) / 1e9}%.1f s"); r
    }
    val spilled = t("spill") {
      SimilarityQueries.spilledSqrtN(spark, dir).localCheckpoint(true) }
    val points = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .localCheckpoint(true)
    val n = points.count()
    val m = SimilarityQueries.NswM
    val initDeg = SimilarityQueries.nndRingDeg(n)
    val rounds = SimilarityQueries.NndRounds
    println(s"n=$n deg=$initDeg rounds=$rounds m=$m")

    // === inlined knnGraphEdgesNnd with counters ===
    val pts = points.select(col("vec_id"), col("v")).dropDuplicates("vec_id")
    def directedTopM(candKeys: DataFrame): DataFrame = {
      val pn = pts.withColumn("nrm", norm2Fast(col("v")))
        .select(col("vec_id"), col("v"), col("nrm"))
      val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("dst"))
      candKeys
        .join(pn.select(col("vec_id").as("src"), col("v").as("va"), col("nrm").as("na")), "src")
        .join(pn.select(col("vec_id").as("dst"), col("v").as("vb"), col("nrm").as("nb")), "dst")
        .select(col("src"), col("dst"),
          ((dotFast(col("va"), col("vb"))) / (col("na") * col("nb"))).as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= m)
        .select(col("src"), col("dst"))
    }
    val posW = Window.partitionBy(col("cell")).orderBy(col("vec_id"))
    val mem = spilled.select(col("vec_id"), col("cell"))
      .withColumn("pos", row_number().over(posW) - 1)
      .localCheckpoint(eager = true)
    val sz = mem.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    def ringKeys(tt: Int): DataFrame = mem.join(sz, "cell")
      .select(col("cell"), col("vec_id").as("src"), col("pos"), col("n"),
        explode(array((tt * initDeg + 1 to (tt + 1) * initDeg).map(lit): _*))
          .as("o"))
      .where(col("o") < col("n"))
      .select(col("cell"), col("src"),
        ((col("pos") + col("o")) % col("n")).as("tpos"))
      .join(mem.select(col("cell"), col("vec_id").as("dst"),
        col("pos").as("tpos")), Seq("cell", "tpos"))
      .where(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
    def rev(df: DataFrame): DataFrame =
      df.select(col("dst").as("src"), col("src").as("dst"))
    var prev: DataFrame = null
    var e = t("init ring+topM") {
      directedTopM(ringKeys(0)).localCheckpoint(eager = true) }
    for (tt <- 1 to rounds) {
      println(s"ROUND $tt")
      val u = t("  u") { e.union(rev(e)).distinct().localCheckpoint(eager = true) }
      val nw = t("  nw(except)") {
        (if (prev == null) e else e.except(prev)).localCheckpoint(eager = true) }
      println(s"  |e|=${e.count()} |u|=${u.count()} |nw|=${nw.count()}")
      val nwu = nw.union(rev(nw)).distinct()
      val non = nwu.as("a").join(u.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .unionByName(
          u.as("a").join(nwu.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src").as("src"), col("b.dst").as("dst")))
        .where(col("src") =!= col("dst"))
      val nonC = t("  non count") { non.count() }
      val rk = t("  ring keys") { ringKeys(tt).localCheckpoint(true) }
      println(s"  |non|=$nonC |ring|=${rk.count()}")
      val cand = t("  cand distinct") {
        e.unionByName(non).unionByName(rk).distinct().localCheckpoint(true) }
      println(s"  |cand|=${cand.count()}")
      prev = e
      e = t("  topM") { directedTopM(cand).localCheckpoint(eager = true) }
    }
    val fin = t("symmetrize") { e.union(rev(e)).distinct().count() }
    println(s"final |edges|=$fin")
    spark.stop()
  }
}
