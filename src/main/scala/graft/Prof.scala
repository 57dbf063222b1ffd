package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for optimization work — times sub-steps of a hot entry.
  * Not part of the driver contract; safe to delete. */
object Prof {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** Whole-JVM counters for the 8-vs-32-core adjudication (r16 verdict ask
    * #2): jobs/tasks submitted, summed task run/GC/deserialize time from
    * TaskMetrics, plus driver GC-bean deltas. Scoped-fork queries share the
    * SparkContext, so one listener sees every entry's work. */
  private final class Counters extends org.apache.spark.scheduler.SparkListener {
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      Option(e.taskMetrics).foreach { m =>
        gcMs.addAndGet(m.jvmGCTime)
        runMs.addAndGet(m.executorRunTime)
        deserMs.addAndGet(m.executorDeserializeTime)
      }
    }
    override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
      stages.incrementAndGet()
  }

  private def driverGcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }

  /** Run `f` with the counters attached and print the deltas. */
  def counted[A](s: SparkSession, name: String)(f: => A): A = {
    val c = new Counters
    s.sparkContext.addSparkListener(c)
    val gc0 = driverGcMs()
    val t0 = System.nanoTime()
    val r = f
    val wall = (System.nanoTime() - t0) / 1e9
    // listener bus is async — let the queue drain before reading counters
    Thread.sleep(300)
    s.sparkContext.removeSparkListener(c)
    println(f"[prof.counted] $name%-28s wall=$wall%7.2f s jobs=${c.jobs.get}%4d stages=${c.stages.get}%4d tasks=${c.tasks.get}%5d taskRun=${c.runMs.get / 1000.0}%7.2f s taskGC=${c.gcMs.get / 1000.0}%6.2f s taskDeser=${c.deserMs.get / 1000.0}%6.2f s jvmGC=${(driverGcMs() - gc0) / 1000.0}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val what = args.headOption.getOrElse("mv_refresh_cdf")
    // comma-separated entry names: each is profiled bench-style — artifacts
    // cleared first (rep 1 = cold, the bench's per-rep cost), then a shared
    // rep 2/3 (steady state within one rep's artifact cache)
    for (name <- what.split(",") if SparkEntry.queries.contains(name)) {
      graft.operators.Artifacts.clear()
      counted(spark, "cold: " + name)(SparkEntry.queries(name)(spark, dir).count())
      (1 to 2).foreach { i =>
        counted(spark, s"run $i: " + name)(SparkEntry.queries(name)(spark, dir).count())
      }
    }
    if (what == "mv_refresh_cdf") mvBreakdown(spark, dir)
    if (what == "events_join_stream")
      Seq(4, 1, 4, 1).foreach(p => ssjoinBreakdown(spark, dir, p))
    if (what == "events_dau_stream") dauBreakdown(spark, dir)
    if (what == "cms_freq_stream") cmsBreakdown(spark, dir)
    if (what == "internal_plans")
      internalPlans(spark, dir, args(1), args.drop(2).toSet)
    if (what == "graph_communities") graphBreakdown(spark, dir)
    if (what == "nsw") nswBreakdown(spark, dir)
    spark.stop()
  }

  /** Per-trigger breakdown of the dau bitmap stream shape (the costliest
    * streaming entry on the 32-core driver bench) — replicates
    * [[graft.queries.EventQueries.dauStreamBitmap]]'s harness so the
    * StreamingQueryProgress durations are reachable. */
  def dauBreakdown(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val fork = s.newSession()
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    if (sys.env.get("PROF_CKPT").contains("fs"))
      fork.conf.set("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
    val staged = graft.operators.Artifacts.sharedPath(s"stage:dau_3d_sent:$dir")(_ => ())
    sys.env.get("PROF_PARTS").foreach(p =>
      fork.conf.set("spark.sql.shuffle.partitions", p))
    if (!sys.env.contains("PROF_PARTS"))
      graft.queries.StreamScratch.sizeStateStoresAdaptive(fork, staged)
    println(s"[prof] ---- dau with shuffle.partitions=${fork.conf.get("spark.sql.shuffle.partitions")} ----")
    val root = graft.queries.StreamScratch.fresh("dau_prof")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    val stream = fork.readStream.schema("user_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = counted(s, "dau stream") {
      val q0 = stream
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("w"),
          expr("user_id div 32").as("block"))
        .agg(expr("bit_or(shiftleft(1L, cast(pmod(user_id, 32) as int)))").as("word"))
        .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("word"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q0.awaitTermination()
      q0
    }
    dumpProgress(q)
  }

  private def dumpProgress(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val progs = q.recentProgress
    println(s"[prof] triggers: ${progs.length}")
    val keys = Seq("addBatch", "getBatch", "latestOffset", "queryPlanning",
      "walCommit", "commitOffsets", "triggerExecution")
    keys.foreach { k =>
      val vals = progs.flatMap(p => Option(p.durationMs.get(k)).map(_.toLong))
      if (vals.nonEmpty)
        println(f"[prof] $k%-18s n=${vals.length}%3d total=${vals.sum / 1000.0}%7.2f s avg=${vals.sum.toDouble / vals.length}%7.1f ms")
    }
    val st = progs.flatMap(p => Option(p.stateOperators).toSeq.flatten)
    if (st.nonEmpty) {
      println(f"[prof] stateCommit total=${st.map(_.commitTimeMs).sum / 1000.0}%7.2f s")
      println(f"[prof] stateRows last=${st.lastOption.map(_.numRowsTotal).getOrElse(-1L)}")
    }
  }

  /** Sub-step timers for graph_communities: edges vs LPA rounds. */
  def graphBreakdown(s: SparkSession, dir: String): Unit = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val edges = t("linkGraph count") {
      val e = graft.queries.GraphQueries.linkGraph(docs, n)
      e.write.format("noop").mode("overwrite").save(); e
    }
    Seq(0, 1, 2, 3).foreach { it =>
      t(s"labelPropagate iters=$it") {
        graft.operators.Graph.labelPropagate(
            edges, docs.select(col("doc_id").as("id")), it)
          .groupBy(col("label")).agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    Seq("4" -> "true", "4" -> "false", "32" -> "false").foreach { case (p, aqe) =>
      val fork = s.newSession()
      fork.conf.set("spark.sql.shuffle.partitions", p)
      fork.conf.set("spark.sql.adaptive.enabled", aqe)
      val docsF = fork.read.parquet(s"$dir/documents.parquet")
      val e2 = graft.queries.GraphQueries.linkGraph(docsF, n)
      t(s"LPA iters=3 parts=$p aqe=$aqe") {
        graft.operators.Graph.labelPropagate(
            e2, docsF.select(col("doc_id").as("id")), 3)
          .groupBy(col("label")).agg(count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
    }
  }

  /** Sub-step timers for the ann_nsw family's per-rep cost: the shared
    * spilled assignment, each build flavor, and the serve walk. */
  def nswBreakdown(s: SparkSession, dir: String): Unit = {
    import graft.operators.{Similarity, Kmeans}
    import graft.queries.SimilarityQueries
    val m = SimilarityQueries.NswM
    val p = graft.queries.SomQueries.points(s, dir)
    val n = p.count()
    val full = counted(s, "spilledSqrtN+ckpt") {
      SimilarityQueries.spilledSqrtN(s, dir).localCheckpoint(eager = true)
    }
    counted(s, "maximinSeeds(entries)") {
      Kmeans.maximinSeeds(p, SimilarityQueries.NswEntries, spherical = true)
    }
    val directed = counted(s, "knnGraphDirected(full)") {
      Similarity.knnGraphDirected(full, m).localCheckpoint(eager = true)
    }
    counted(s, "symEdges(directed)") {
      directed.union(directed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().write.format("noop").mode("overwrite").save()
    }
    counted(s, "knnGraphEdgesNnd") {
      Similarity.knnGraphEdgesNnd(full, p, m,
        SimilarityQueries.nndRingDeg(n), SimilarityQueries.NndRounds)
        .write.format("noop").mode("overwrite").save()
    }
    val doomed = p.where(col("vec_id") % SimilarityQueries.NswGdprMod === 0 &&
        col("vec_id") >= SimilarityQueries.centroidCount(n))
      .select(col("vec_id"))
    counted(s, "gdpr deleteIncremental") {
      Similarity.knnGraphDeleteIncremental(full, directed, doomed, m)
        .write.format("noop").mode("overwrite").save()
    }
    val edges = directed.union(
      directed.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .localCheckpoint(eager = true)
    val probes = p.where(col("vec_id") < SimilarityQueries.NumProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("p"))
    val entries = Kmeans.maximinSeeds(p, SimilarityQueries.NswEntries,
      spherical = true)
    import s.implicits._
    (1 to 2).foreach { i =>
      counted(s, s"serve walk $i") {
        Similarity.nswTopK(edges, p, probes, entries.toSeq.toDF("vec_id"),
          SimilarityQueries.K, SimilarityQueries.NswBeam,
          SimilarityQueries.NswSteps).write.format("noop").mode("overwrite").save()
      }
    }
    // NND build cost by round count — isolates init vs per-round cost
    (0 to 3).foreach { r =>
      counted(s, s"knnGraphEdgesNnd rounds=$r") {
        Similarity.knnGraphEdgesNnd(full, p, m,
          SimilarityQueries.nndRingDeg(n), r)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // AQE-off / sized-partitions forks: is the walk (and the NND build)
    // driver-bound on AQE's per-stage re-optimization at this volume?
    Seq(("aqe=on parts=32", "true", "32"), ("aqe=off parts=4", "false", "4"),
        ("aqe=off parts=1", "false", "1"), ("aqe=on parts=4", "true", "4")).foreach {
      case (label, aqe, parts) =>
        val fork = s.newSession()
        fork.conf.set("spark.sql.adaptive.enabled", aqe)
        fork.conf.set("spark.sql.shuffle.partitions", parts)
        val pF = graft.queries.SomQueries.points(fork, dir)
        val fullF = {
          // fork-local copy of spilledSqrtN (the shared artifact is bound to
          // the main session's conf; this A/B needs the fork's)
          import org.apache.spark.sql.expressions.Window
          val cells = SimilarityQueries.centroidCount(pF.count())
          val protos = pF.where(col("vec_id") < cells)
            .select(col("vec_id").cast("long").as("cell"), col("v").as("c"))
          val cosC = graft.functions.VectorSql.dotFast(col("v"), col("c")) /
            (graft.functions.VectorSql.norm2Fast(col("v")) *
              graft.functions.VectorSql.norm2Fast(col("c")))
          val w = Window.partitionBy(col("vec_id")).orderBy(col("vcos").desc, col("cell"))
          pF.crossJoin(broadcast(protos))
            .select(col("vec_id"), col("v"), col("cell"), cosC.as("vcos"))
            .withColumn("vrn", row_number().over(w))
            .where(col("vrn") <= SimilarityQueries.SpillCells)
            .select(col("vec_id"), col("v"), col("cell"))
        }.localCheckpoint(eager = true)
        val dirF = Similarity.knnGraphDirected(fullF, m).localCheckpoint(eager = true)
        val edF = dirF.union(dirF.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint(eager = true)
        val prF = pF.where(col("vec_id") < SimilarityQueries.NumProbes)
          .select(col("vec_id").as("probe_id"), col("v").as("p"))
        (1 to 2).foreach { i =>
          counted(fork, s"walk $label $i") {
            Similarity.nswTopK(edF, pF, prF, entries.toSeq.toDF("vec_id"),
              SimilarityQueries.K, SimilarityQueries.NswBeam,
              SimilarityQueries.NswSteps).write.format("noop").mode("overwrite").save()
          }
        }
        counted(fork, s"nnd $label") {
          Similarity.knnGraphEdgesNnd(fullF, pF, m,
            SimilarityQueries.nndRingDeg(n), SimilarityQueries.NndRounds)
            .write.format("noop").mode("overwrite").save()
        }
    }
  }

  /** Scratch copy of [[graft.operators.Similarity.nswWalkVisited]] with
    * knobs, for the r17 A/B only — the winner gets folded back into the
    * operator (identical semantics: hints and checkpoint cadence change
    * neither the visited set nor the ranks). */
  private def walkVariant(s: SparkSession, edges: org.apache.spark.sql.DataFrame,
                          points: org.apache.spark.sql.DataFrame,
                          probes: org.apache.spark.sql.DataFrame,
                          entries: Array[Long], bcast: Boolean,
                          ckptEvery: Int): Unit = {
    import graft.functions.VectorSql.norm2Fast
    import graft.queries.SimilarityQueries.{K, NswBeam, NswSteps}
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    def cosFromNorms(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                     na: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
      graft.functions.VectorSql.dotFast(a, b) / (na * nb)
    val entryPairs = probes.select(col("probe_id"))
      .crossJoin(entries.toSeq.toDF("vec_id"))
    val pn0 = points.withColumn("nrm", norm2Fast(col("v")))
      .select(col("vec_id"), col("v"), col("nrm"))
    val pn = if (bcast) broadcast(pn0) else pn0
    val ed = if (bcast) broadcast(edges) else edges
    val pr = probes.withColumn("np", norm2Fast(col("p")))
      .localCheckpoint(eager = true)
    def score(reached: org.apache.spark.sql.DataFrame) =
      reached.join(pn, "vec_id").join(broadcast(pr), "probe_id")
        .select(col("probe_id"), col("vec_id"),
          cosFromNorms(col("v"), col("p"), col("nrm"), col("np")).as("cos"))
    var visited = score(
        broadcast(entryPairs.select(col("probe_id"), col("vec_id")).distinct()))
      .localCheckpoint(eager = true)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    for (step <- 1 to NswSteps) {
      val beamDf = visited.withColumn("rn", row_number().over(w))
        .where(col("rn") <= NswBeam).select(col("probe_id"), col("vec_id"))
      val reached = beamDf.join(ed, beamDf("vec_id") === ed("src"))
        .select(col("probe_id"), col("dst").as("vec_id"))
      visited = visited.unionByName(score(reached)).distinct()
      if (step % ckptEvery == 0 || step == NswSteps)
        visited = visited.localCheckpoint(eager = true)
    }
    val wr = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
    visited.where(col("vec_id") =!= col("probe_id"))
      .withColumn("rank", row_number().over(wr)).where(col("rank") <= K)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"))
      .write.format("noop").mode("overwrite").save()
  }

  /** Dumps the INTERNAL frames' plans that entry-level explain cannot see
    * (driver-side fits, foreachBatch bodies): the per-iteration PQ
    * assignment frame and the preimage change feed. */
  def internalPlans(s: SparkSession, dir: String, suffix: String,
                    only: Set[String] = Set.empty): Unit = {
    def wanted(k: String) = only.isEmpty || only(k)
    val mode = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    // repo-root-anchored (r16 ADVICE: a hardcoded absolute path silently
    // writes outside the checkout on any other machine)
    val out = RepoRoot.dir.resolve("plans")
      .resolve(sys.env.getOrElse("PROF_PLANS_DIR", "r17"))
    java.nio.file.Files.createDirectories(out)
    // (a) one Lloyd-PQ assignment iteration's frame (the hot subplan of
    // pq_train): reproduce iteration 0's assign+sums plan
    if (wanted("pq")) locally {
      val pts = s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val numCodes = 16 // plan shape is size-independent
      val subDims = graft.queries.SimilarityQueries.PqSubDims
      val seed = pts.where(col("vec_id") < numCodes).orderBy("vec_id")
        .collect().map(_.getSeq[Double](1).toArray)
      val dim = seed(0).length
      val nSub = dim / subDims
      import s.implicits._
      val plan =
        if (suffix == "before") {
          val codes = Array.tabulate(nSub, numCodes) { (sb, j) =>
            seed(j).slice(sb * subDims, (sb + 1) * subDims) }
          val subvecs = pts.select(col("vec_id"),
            explode(array((0 until nSub).map { i =>
              struct(lit(i).as("sub"),
                slice(col("v"), i * subDims + 1, subDims).as("sv"))
            }: _*)).as("ss"))
            .select(col("vec_id"), col("ss.sub").as("sub"), col("ss.sv").as("sv"))
          val codeDF = (for (sb <- 0 until nSub; j <- 0 until numCodes)
            yield (sb, j.toLong, codes(sb)(j))).toDF("sub", "code", "c")
          subvecs.join(broadcast(codeDF), "sub")
            .select(col("vec_id"), col("sub"), col("sv"),
              graft.functions.VectorSql.sqDistFast(col("sv"), col("c")).as("d2"),
              col("code"))
            .groupBy(col("vec_id"), col("sub"))
            .agg(min(struct(col("d2"), col("code"))).as("mm"),
              first(col("sv")).as("sv"))
            .select(col("sub"), col("mm.code").as("code"), col("sv"))
        } else {
          pts.select(
              posexplode(graft.functions.PqExpressions.pqEncode(
                col("v"), seed, subDims)).as(Seq("sub", "code")),
              col("v"))
            .select(col("sub"), col("code").cast("long").as("code"),
              slice(col("v"), col("sub") * lit(subDims) + lit(1),
                lit(subDims)).as("sv"))
        }
      val sums = plan
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy(col("sub"), col("code"), col("dim"))
        .agg(sum(round(col("x") * 10000, 0).cast("long")).as("si"),
          count(lit(1)).as("n"))
      java.nio.file.Files.writeString(
        out.resolve(s"pq_train_assign_iter_$suffix.txt"),
        sums.queryExecution.explainString(mode))
      println(s"wrote pq_train_assign_iter_$suffix.txt")
    }
    // (c) one LPA round's votes/winner frame (the hot subplan of
    // graph_communities): "before" is the r16 shape — adj repartitioned at
    // the session shuffle default — "after" the |E|-derived width the
    // operator now computes (r17). Same values either way (exact integer
    // plurality); the diff is the Exchange partitioning.
    if (wanted("lpa")) locally {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val edges = graft.queries.GraphQueries.linkGraph(docs, n)
      val und = edges.where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v")).distinct()
      val adjBase = und.select(col("u").as("p"), col("v").as("x"))
        .unionAll(und.select(col("v").as("p"), col("u").as("x")))
      val adj = if (suffix == "before") adjBase.repartition(col("x"))
        else adjBase.repartition(
          graft.operators.Graph.edgePartitions(edges), col("x"))
      val lab = docs.select(col("doc_id").as("id"))
        .withColumn("label", col("id"))
      val votes = adj.join(lab.withColumnRenamed("id", "x"), "x")
        .groupBy(col("p"), col("label")).agg(count(lit(1)).as("c"))
      val winner = votes.groupBy(col("p"))
        .agg(max(struct(col("c"), (-col("label")).as("neg"))).as("w"))
        .select(col("p").as("id"), (-col("w.neg")).as("new_label"))
      java.nio.file.Files.writeString(
        out.resolve(s"graph_lpa_round_$suffix.txt"),
        winner.queryExecution.explainString(mode))
      println(s"wrote graph_lpa_round_$suffix.txt")
    }
    // the GDPR delete-incremental build frame (inside the nsw_graph_gdpr
    // artifact — entry-level explain only shows the post-checkpoint walk).
    // "before" replicates the pre-r17 shape inline: enumerate ALL same-cell
    // pairs, THEN semi-join on the affected srcs (the optimizer does not
    // push the semi below the self-join + distinct); "after" is the live
    // operator with the src side pre-filtered.
    if (wanted("nsw_gdpr")) locally {
      import graft.operators.Similarity
      import graft.queries.SimilarityQueries
      val p = graft.queries.SomQueries.points(s, dir)
      val full = SimilarityQueries.spilledSqrtN(s, dir)
      val m = SimilarityQueries.NswM
      val doomed = p.where(col("vec_id") % SimilarityQueries.NswGdprMod === 0 &&
          col("vec_id") >= SimilarityQueries.centroidCount(p.count()))
        .select(col("vec_id"))
      val did = doomed.select(col("vec_id")).toDF("id")
      val splS = full.join(did, full("vec_id") === did("id"), "left_anti")
        .localCheckpoint(eager = true)
      val directed = Similarity.knnGraphDirected(full, m)
        .localCheckpoint(eager = true)
      val affected = directed.join(did, directed("dst") === did("id"), "left_semi")
        .select(col("src")).distinct()
        .join(did, col("src") === did("id"), "left_anti")
      val slim = splS.select(col("vec_id"), col("cell"))
      // both dumps are the freshKeys subtree only (inputs checkpointed so
      // the diff is the pair-enumeration shape, not the carried builds)
      val plan =
        if (suffix == "before")
          slim.as("a").join(slim.as("b"),
              col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
            .distinct()
            .join(affected, Seq("src"), "left_semi")
        else
          splS.join(affected, splS("vec_id") === affected("src"), "left_semi")
            .select(col("vec_id"), col("cell")).as("a")
            .join(slim.as("b"),
              col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id"))
            .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
            .distinct()
      java.nio.file.Files.writeString(
        out.resolve(s"nsw_gdpr_build_$suffix.txt"),
        plan.queryExecution.explainString(mode))
      println(s"wrote nsw_gdpr_build_$suffix.txt")
    }
    // (b) the preimage change feed (the hot subplan of the CDF consumers)
    if (wanted("preimage")) locally {
      val fork = s.newSession()
      // force the mvcdf layout build via the entry, then resolve its path
      SparkEntry.queries("mv_refresh_cdf")(s, dir).count()
      val table = graft.operators.Artifacts.sharedPath(s"mvcdf:$dir")(_ => ())
      val (cdf, _) = graft.sources.Versioned.changes(
        fork, s"$table/table", 1, 2, "lkey", withPreimage = true)
      java.nio.file.Files.writeString(
        out.resolve(s"changes_preimage_$suffix.txt"),
        cdf.queryExecution.explainString(mode))
      println(s"wrote changes_preimage_$suffix.txt")
    }
  }

  /** Sub-step timers for the cms_freq_stream shape. */
  def cmsBreakdown(s: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val fork = s.newSession()
    fork.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("PROF_PARTS", "8"))
    import fork.implicits._
    val root = graft.queries.StreamScratch.fresh("cms_prof")
    val (inDir, outDir, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    t("cms: input stage write") {
      fork.read.parquet(s"$dir/lineitem.parquet").select(col("l_partkey"))
        .repartition(3).write.parquet(inDir)
    }
    t("cms: stream (3 triggers)") {
      val stream = fork.readStream.schema("l_partkey LONG")
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val buckets = stream
        .select(explode(graft.queries.AdvancedQueries.cmsBuckets(col("l_partkey"))).as("rc"))
        .select(col("rc.r").as("r"), col("rc.c").as("c"))
        .as[graft.streaming.CmsStream.Bucket]
      val q = graft.streaming.CmsStream.sketchStream(buckets, graft.queries.AdvancedQueries.CmsW).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    t("cms: read-back + report") {
      val out = fork.read
        .schema("r INT, seen BIGINT, counts ARRAY<BIGINT>").parquet(outDir)
      val wspec = org.apache.spark.sql.expressions.Window
        .partitionBy(col("r")).orderBy(col("seen").desc)
      val sketch = out.withColumn("rn", row_number().over(wspec))
        .where(col("rn") === 1)
        .select(col("r"), posexplode(col("counts")).as(Seq("c", "cnt")))
        .where(col("cnt") > 0)
        .select(col("r"), col("c").cast("long").as("c"), col("cnt"))
      val est = graft.queries.AdvancedQueries.cmsEstimatesFrom(fork, dir, sketch)
      est.orderBy(col("est_freq").desc, col("l_partkey")).limit(10)
        .write.format("noop").mode("overwrite").save()
    }
  }

  /** Re-runs the stream-stream join harness and dumps per-trigger duration
    * breakdowns from the progress events. */
  def ssjoinBreakdown(s: SparkSession, dir: String, parts: Int): Unit = {
    import org.apache.spark.sql.functions._
    println(s"[prof] ---- ssjoin with shuffle.partitions=$parts ----")
    val fork = s.newSession()
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    fork.conf.set("spark.sql.shuffle.partitions", parts.toString)
    val staged = graft.operators.Artifacts.sharedPath(s"stage:ssjoin_3d:$dir")(_ => ())
    val root = graft.queries.StreamScratch.fresh("ssjoin_prof")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    def side(inDir: String) = fork.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val vs = side(s"$staged/view")
      .withColumn("view_ts", timestamp_micros(col("ts_us")))
      .withWatermark("view_ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("view_ts"), col("user_id"))
    val cs = side(s"$staged/click")
      .withColumn("click_ts", timestamp_micros(col("ts_us")))
      .withWatermark("click_ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("click_ts"),
        col("user_id").as("c_user_id"))
    val q = vs.join(cs, expr(
        """user_id = c_user_id AND
          |click_ts >= view_ts AND
          |click_ts <= view_ts + interval 30 minutes""".stripMargin))
      .select(col("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    counted(s, s"ssjoin parts=$parts")(q.awaitTermination())
    dumpProgress(q)
  }

  /** Replicates mvRefreshCdf's body with per-step timers. */
  def mvBreakdown(s: SparkSession, dir: String): Unit = {
    val fork = s.newSession()
    import fork.implicits._
    val table = {
      // same sharedPath key the entry uses — layout already built by warm run
      val p = graft.operators.Artifacts.sharedPath(s"mvcdf:$dir")(_ => ())
      s"$p/table"
    }
    val vLast = t("latestVersion")(graft.sources.Versioned.latestVersion(table))
    (2 to vLast).foreach { v =>
      val (cdf, _) = graft.sources.Versioned.changes(
        fork, table, v - 1, v, "lkey", withPreimage = true)
      t(s"changes v$v count") {
        val add = col("op").isin("I", "U+")
        cdf.groupBy(col("month"), col("l_returnflag"))
          .agg(sum(when(add, 1L).otherwise(-1L)).as("n_items"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("readVersion(1) + agg") {
      graft.sources.Versioned.readVersion(fork, table, 1)
        .groupBy(col("month"), col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"))
        .write.format("noop").mode("overwrite").save()
    }
    // streaming harness overhead: stage 2 signal files + foreachBatch stream
    t("stage+stream harness") {
      val root = graft.queries.StreamScratch.fresh("mvcdf_prof")
      val (inDir, ckpt) = (s"$root/in", s"$root/ckpt")
      graft.queries.StreamScratch.stageOrdered(inDir,
        (2 to vLast).map(v => Seq(v).toDF("version")))
      val stream = fork.readStream.schema("version INT")
        .option("maxFilesPerTrigger", 1).parquet(inDir)
      val q = stream.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.count(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }
}
