package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Runs the whole set `SPARK_GRAFT_BENCH_REPS` times
  * (default 3) and reports the per-query MEDIAN — this box shows 2-3×
  * single-run variance, so medians are what the round-over-round 2× guard
  * should compare. Shared artifacts ([[graft.operators.Artifacts]]) are
  * dropped between reps so every rep pays the full pipeline cost honestly.
  *
  * SELF-ADJUDICATING ARTIFACT (r16, closing the r15 verdict's recurring
  * mover-adjudication tax): `target/bench.json` carries, beside the
  * medians, (a) `reps_per_query` — every entry's PER-REP wall times in rep
  * order, so a ">2× mover" whose slow reps coincide with inflated sentinel
  * reps is adjudicated as contention straight off the artifact, no
  * re-measurement session; and (b) `errors` — entry failures recorded
  * verbatim (query, rep, exception) instead of the old silent
  * `catch { _ => -1L }`, so a targeted scale run over a broken entry can
  * never report a misleadingly small time with no signal. The stdout line
  * stays byte-budgeted (the driver scrapes only a bounded tail) and gains
  * just the error COUNT; the file is the complete record.
  */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/session once so the first measured query doesn't absorb
    // codegen + scheduler startup (~3s) that isn't its own cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // optional query-name filter (comma-separated) for targeted scale runs —
    // the driver never sets it, so the per-round bench stays the full catalog
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // CALIBRATION SENTINEL (r7 verdict ask #6): a fixed, data-independent,
    // CPU-bound workload timed before each rep. Its wall time depends only
    // on this box's available compute — so a contended run (the r7 driver
    // bench measured uniformly ~2× inflated against a same-box re-run)
    // flags ITSELF: sentinel_sec inflates by the same contention factor as
    // the query medians, and a reader divides it out instead of
    // adjudicating with a second measurement session. Reference on this
    // box, uncontended: ~0.35 s (BASELINE.md).
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(1L << 27).selectExpr("count(xxhash64(id)) c").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val sentinels = scala.collection.mutable.ListBuffer.empty[Double]
    // (query, rep, exception) — recorded, never swallowed (r15 demerit #3)
    val errors = scala.collection.mutable.ListBuffer.empty[(String, Int, String)]
    val samples = (1 to reps).flatMap { rep =>
      graft.operators.Artifacts.clear()
      sentinels += sentinel()
      // SORTED execution order (r15): Map iteration order reshuffles whenever
      // the catalog grows (HashMap rehash), which silently moves the payer of
      // each Artifacts.shared family build between rounds — the repeated
      // ">2×-raw mover that is really attribution" adjudications of r8-r14.
      // Sorting by name pins the alphabetically-first consumer as the payer
      // every round, so round-over-round per-entry medians compare
      // apples-to-apples even as entries are added.
      SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => only.forall(_(kv._1))).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          // the wall time up to the throw still records (the entry DID cost
          // it), but the failure is carried in-band — a broken entry can
          // never masquerade as a fast one
          errors += ((name, rep,
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"))
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val sentinelMed = median(sentinels.toSeq)
    val byName: Map[String, Seq[Double]] = samples.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val results = byName.view.mapValues(median).toMap
    // The driver's stdout scrape keeps only the LAST 2000 bytes, so a full
    // 120+-query map (~3 KB even at 4 decimals) can never parse from the
    // tail — that's the "parsed": null of rounds 4-6. The stdout line
    // therefore carries total + as many per-query medians as fit a hard
    // byte budget, COSTLIEST FIRST (the ones a bench reader acts on), plus
    // "queries_elided" so the truncation is explicit. target/bench.json
    // (written below, atomically) stays the complete full-precision record
    // — including per-rep arrays and the error list.
    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\n\\r\\t]", " ") + "\""
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val byCost = results.toSeq.sortBy { case (k, v) => (-v, k) }
    val budget = 1500 // leaves ~250 bytes of trailing sbt chatter inside 2000
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var used = 0
    for ((k, v) <- byCost) {
      val entry = "\"" + k + "\":" + f(v)
      if (used + entry.length + 1 <= budget) { kept += entry; used += entry.length + 1 }
    }
    val json =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","sentinel_sec":${f(sentinelMed)},"sentinel_reps":${sentinels.map(f).mkString("[", ",", "]")},"n_errors":${errors.size},"queries":${kept.mkString("{", ",", "}")},"queries_elided":${results.size - kept.size},"full":"target/bench.json","sf":"$sfDir","reps":$reps}"""
    // the complete map goes to the file; same shape plus the per-rep arrays
    // (rep order preserved — slot i aligns with sentinel_reps[i]) and errors
    val fullJson = {
      val meds = results.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
      val repsMap = byName.toSeq.sortBy(_._1)
        .map { case (k, vs) => "\"" + k + "\":" + vs.map(f).mkString("[", ",", "]") }
        .mkString("{", ",", "}")
      val errs = errors.map { case (q, r, e) =>
        s"""{"query":${jstr(q)},"rep":$r,"error":${jstr(e)}}"""
      }.mkString("[", ",", "]")
      s"""{"metric":"total","value":${f(total)},"unit":"sec","sentinel_sec":${f(sentinelMed)},"sentinel_reps":${sentinels.map(f).mkString("[", ",", "]")},"queries":$meds,"reps_per_query":$repsMap,"errors":$errs,"sf":"$sfDir","reps":$reps}"""
    }
    // Persist to a file, atomically (tmp + rename): the file is the
    // loss-proof artifact. Path printed so callers find it.
    try {
      import java.nio.file.{Files, StandardCopyOption}
      // repo-root-anchored, NOT cwd-relative: a wrapper launching the bench
      // JVM from another directory must still land the artifact where the
      // driver's scraper looks (same discipline as SourceQueries.FixtureDir)
      val dir = RepoRoot.dir.resolve("target")
      Files.createDirectories(dir)
      val tmp = dir.resolve("bench.json.tmp")
      Files.writeString(tmp, fullJson + "\n")
      Files.move(tmp, dir.resolve("bench.json"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      System.err.println(s"bench json written to ${dir.resolve("bench.json").toAbsolutePath}")
    } catch { case e: Exception =>
      System.err.println(s"bench json file write failed (stdout line below is authoritative): $e")
    }
    spark.stop()
    // The one-line JSON is the LAST stdout output, after spark.stop(), so no
    // shutdown chatter can push it out of the driver's bounded tail capture.
    println(json)
    System.out.flush()
  }
}
