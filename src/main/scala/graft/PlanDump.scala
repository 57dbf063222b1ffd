package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-query `.explain("formatted")` dumps for the optimization rounds:
  * `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]"`
  * writes `<outDir>/<name>_<suffix>.txt` for each requested catalog entry —
  * the before/after plan evidence the optimization deliverables require
  * (`plans/r16/<query>_before.txt` / `..._after.txt`). Same session shape as
  * [[Plans]] (the PLANS.md generator), but per-query files and an explicit
  * name list, so a round only regenerates the plans it touched. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <name>[,<name>...]")
    val Array(sfDir, outDir, suffix, namesCsv) = args.take(4)
    val names = namesCsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    Files.createDirectories(Paths.get(outDir))
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"not in the catalog: ${missing.mkString(", ")}")
    names.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(mode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
