package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the [[Versioned]] snapshot store — the
  * packaging that makes the lakehouse core consumable from plain reader
  * syntax instead of the Scala API:
  *
  * {{{
  *   spark.read.format("graftstore")
  *     .option("path", dir)
  *     .option("versionAsOf", 2)          // or timestampAsOf (epoch µs
  *     .load()                            //  or "yyyy-MM-dd HH:mm:ss" UTC)
  * }}}
  *
  * Version resolution goes through the SAME functions the library API uses
  * ([[Versioned.readManifest]] / [[Versioned.versionAsOf]] — one resolution
  * rule, two surfaces), and the scan implements the DSv2 pushdown
  * interfaces:
  *
  *  - `SupportsPushDownFilters`: pushed predicates drive BUCKET SKIPPING
  *    through the commit log's two statistics sidecars — range filters on
  *    the recorded zone-map column ([[Versioned.writeStats]]' `#col`
  *    header) prune buckets whose [min, max] misses the range, and
  *    equality/IN filters on the bloom index's key column prune buckets
  *    whose filter cannot contain any probe. The skipping DECISIONS are
  *    [[zoneKeepBuckets]] / [[bloomKeepBuckets]] — public, so catalog
  *    entries gate the same decision the scan executes. Every filter is
  *    also returned as a residual (Spark re-evaluates it on the surviving
  *    rows): skipping is IO optimization, row-level exactness stays the
  *    engine's job — the one-sided contract both sidecars are built on.
  *  - `SupportsPushDownRequiredColumns`: column pruning reaches the
  *    parquet scans underneath.
  *
  * The physical read is the [[V1Scan]] bridge: `toV1TableScan` hands Spark
  * a relation whose `buildScan` is [[Versioned.readBuckets]] over exactly
  * the surviving (bucket → version) assignment — the identical
  * partition-pruned union-of-manifm-pointers read path every library-API
  * consumer uses, so the connector can never drift from the store
  * semantics it packages. At 100 TB the connector is the difference
  * between "a library" and "a table": SQL users, BI tools, and other
  * engines' Spark jobs read a versioned, statistics-pruned store with no
  * knowledge of manifests. GraftStoreSpec proves the skipping is real by
  * DELETING pruned buckets' files and reading anyway.
  *
  * Reference scope note: the reference (sparkml-som) has no storage layer;
  * this is part of the demanded lakehouse extension surface
  * (SURVEY.md §7). */
class GraftStoreSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider
    with CreatableRelationProvider {
  override def shortName(): String = "graftstore"

  // ---- `df.write.format("graftstore").mode(...).save()` -----------------
  // DataFrameWriter's V2 path requires plain BATCH_WRITE (a real v2
  // BatchWrite); a V1_BATCH_WRITE table falls back to the V1 save command,
  // which needs this interface — the same dual packaging Delta ships. Same
  // commit rule as the SQL INSERT path ([[GraftStoreWrites]]).
  override def createRelation(ctx: SQLContext,
                              mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val caseMap = parameters.map { case (k, v) => k.toLowerCase -> v }
    val opts = new CaseInsensitiveStringMap(
      scala.jdk.CollectionConverters.MapHasAsJava(parameters).asJava)
    val (dir, pin) = GraftStoreSource.resolve(opts)
    val exists = Versioned.latestVersion(dir) > 0
    import org.apache.spark.sql.SaveMode._
    mode match {
      case ErrorIfExists if exists =>
        sys.error(s"graftstore: $dir already holds commits (SaveMode.ErrorIfExists)")
      case Ignore if exists => () // no-op by contract
      case m =>
        GraftStoreWrites.insert(dir, pin,
          name => caseMap.get(name.toLowerCase).map(_.trim).filter(_.nonEmpty),
          data, overwrite = m == Overwrite)
    }
    // a minimal relation for the command's return value: the store's
    // current schema, scanned through the same read path if ever used
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType =
        Versioned.readVersion(ctx.sparkSession, dir,
          Versioned.latestVersion(dir)).schema
      override def buildScan(): RDD[Row] =
        Versioned.readVersion(ctx.sparkSession, dir,
          Versioned.latestVersion(dir)).rdd
    }
  }

  // ---- streaming: the commit log AS a micro-batch source ----------------
  // `readStream.format("graftstore")` serves the change feed
  // ([[Versioned.changes]]) with COMMIT VERSIONS as offsets — see
  // [[GraftStoreChangeSource]]. The batch table above has no
  // MICRO_BATCH_READ capability, so DataStreamReader falls back to this
  // V1 StreamSourceProvider — the streaming twin of the V1Scan/V1Write
  // driver-coordination bridges.
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftStoreChangeSource.feedSchema(
      sqlContext.sparkSession, parameters))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source =
    new GraftStoreChangeSource(sqlContext.sparkSession, parameters)

  // ---- streaming: the store AS a sink ------------------------------------
  // `writeStream.format("graftstore")` lands each micro-batch as a
  // copy-on-write UPSERT COMMIT at version `batchId + firstVersion`
  // (default 2, over a pre-committed base) — the deterministic-batch-id
  // txn discipline built in: a replayed batch sees its manifest and
  // commits nothing, so at-least-once delivery is exactly-once table
  // state with NO foreachBatch harness. Completes the streaming symmetry:
  // readStream tails the table's change feed, writeStream feeds it.
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graftstore sink: the store's bucket column IS the partitioning — " +
        "pass it as a data column, not partitionBy")
    require(outputMode != org.apache.spark.sql.streaming.OutputMode.Complete(),
      "graftstore sink: Complete mode would rewrite the table every batch — " +
        "use append/update (micro-batches upsert on the key)")
    val caseMap = parameters.map { case (k, v) => k.toLowerCase -> v }
    val dir = caseMap.getOrElse("path",
      sys.error("graftstore sink requires option 'path' (the store dir)"))
    val keyCol = caseMap.getOrElse("keycol",
      sys.error("graftstore sink requires option 'keyCol' (the upsert key)"))
    // CDC mode (r15): `opCol 'op'` declares an op column riding the batch —
    // rows whose op is 'D' DELETE their key, every other op upserts — and
    // the commit becomes [[Versioned.commitMerge]] (one mixed commit per
    // batch). Without it the sink stays a pure upserter. This is what lets
    // a change-feed hop replicate DELETES, not just inserts/updates.
    val opCol = caseMap.get("opcol").map(_.trim).filter(_.nonEmpty)
    val firstV = caseMap.get("firstversion").map(_.trim.toInt).getOrElse(2)
    require(firstV >= 2, s"firstVersion must be >= 2 (got $firstV): " +
      "version 1 is the base snapshot (commitBase / a bootstrap append)")
    // QUERY-scoped txn identity: the checkpoint location is the streaming
    // query's durable identity (it survives restarts of the SAME query and
    // differs across queries), so markers carry its digest — without it,
    // two DIFFERENT queries' batch 0 would stamp identical markers and a
    // crashed query X's in-flight claim on version v would read as query
    // Y's own, Y would commit v, and X's resumed batch would then silently
    // skip: the cross-query alias the fail-loud guard exists to catch.
    // Consequence (the pinned contract): a FRESH-checkpoint rerun is a NEW
    // query — re-delivering into already-committed versions fails loud
    // (point it at firstVersion above the existing commits), it never
    // silently absorbs another query's history. Delta scopes its sink txns
    // by queryId the same way.
    // The checkpoint may come from the SESSION conf instead of a writer
    // option (spark.sql.streaming.checkpointLocation names a base dir the
    // engine appends a per-query subdir to) — that base is shared across
    // the session's queries, so it cannot serve as a per-query identity;
    // without the writer option the tag degrades to the shared "nockpt"
    // and cross-query marker aliasing protection with it. Say so (r16,
    // ADVICE) instead of degrading silently.
    val ckptOpt = caseMap.get("checkpointlocation")
    if (ckptOpt.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "graftstore sink: no checkpointLocation WRITER OPTION — the sink's " +
          "txn markers fall back to a shared query tag, so cross-query " +
          "version-aliasing protection is degraded; pass checkpointLocation " +
          "on the writer to scope markers per query")
    val queryTag = GraftStoreSource.sinkQueryTag(ckptOpt)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val v = batchId.toInt + firstV
        val marker = s"graftsink:$queryTag:$batchId"
        if (Versioned.hasVersion(dir, v)) {
          // an existing version is EITHER this sink's own replayed batch
          // (its txn marker matches — skip, the exactly-once guarantee) or
          // a FOREIGN commit that aliased our version number, in which
          // case skipping would silently drop this batch's rows: fail loud
          require(Versioned.txnMarker(dir, v).contains(marker),
            s"graftstore sink: version $v already committed by another " +
              s"writer (txn ${Versioned.txnMarker(dir, v).getOrElse("<none>")}" +
              s", expected $marker) — the sink owns versions from " +
              s"firstVersion=$firstV onward; point concurrent writers or " +
              "maintenance commits below it, or restart the sink with a " +
              "fresh firstVersion above the foreign commit")
          return
        }
        // The marker is stamped BEFORE the commit (r15 crash-window fix): a
        // crash between the two leaves marker-without-manifest, and the
        // replay — finding its OWN marker below — safely re-runs the
        // deterministic commit. The old order (commit, then marker) left
        // manifest-without-marker, which the aliasing check above would
        // misread as a foreign writer and wedge the stream permanently on
        // a routine crash window.
        Versioned.txnMarker(dir, v) match {
          case Some(m) if m != marker => sys.error(
            s"graftstore sink: version $v is claimed in-flight by another " +
              s"writer (txn $m, expected $marker) — same ownership rule as " +
              "a committed alias: fail loud rather than overwrite")
          case Some(_) => () // our own crashed attempt: marker already stamped
          case None => Versioned.writeTxnMarker(dir, v, marker)
        }
        // ForeachBatchSink's rewrap: a pure batch frame the multi-action
        // commit plan (distinct-bucket collect + anti-join write) can reuse
        val batch = org.apache.spark.sql.graftbridge.ColumnBridge.asPureBatch(data)
        val bucketCol = Versioned.bucketColumn(batch.sparkSession, dir)
        opCol match {
          case Some(oc) =>
            require(batch.columns.exists(_.equalsIgnoreCase(oc)),
              s"graftstore sink: opCol '$oc' is not a column of the batch")
            val c = batch.columns.find(_.equalsIgnoreCase(oc)).get
            val changes = batch
              .withColumn("graft_op_norm",
                org.apache.spark.sql.functions.when(
                  org.apache.spark.sql.functions.col(c) === "D",
                  org.apache.spark.sql.functions.lit("D"))
                  .otherwise(org.apache.spark.sql.functions.lit("U")))
              .drop(c).withColumnRenamed("graft_op_norm", "op")
            Versioned.commitMerge(changes.sparkSession, changes, dir, v,
              keyCol, bucketCol)
          case None =>
            Versioned.commitUpsert(batch.sparkSession, batch, dir, v, keyCol,
              bucketCol)
        }
      }
      override def toString: String = s"GraftStoreSink[$dir, key=$keyCol]"
    }
  }

  /** A caller may supply the schema (skipping [[inferSchema]]'s data-file
    * read) — with the sidecars present, a metadata-only aggregate then
    * never opens a data file at all (GraftStoreSpec proves it by deleting
    * every one). */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (dir, pin) = GraftStoreSource.resolve(options)
    val v = pin.getOrElse(Versioned.latestVersion(dir))
    // the unpinned path must fail-fast on an empty store with a clear
    // message, not a raw NoSuchFileException from readVersion(dir, 0)
    require(Versioned.hasVersion(dir, v), s"graftstore: no version $v under $dir")
    Versioned.readVersion(SparkSession.active, dir, v).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (dir, pin) = GraftStoreSource.resolve(opts)
    new GraftStoreTable(schema, dir, pin, opts)
  }
}

object GraftStoreSource {
  /** Integral filter literal → Long, the ONE decoder both skipping
    * consumers share (the scan's prune and SupportsDelete's probes) — a
    * widening (boxed java types, BigDecimal keys) lands in both at once. */
  private[sources] def longLit(a: Any): Option[Long] = a match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  /** The streaming sink's query identity — a digest of the CANONICALIZED
    * checkpoint location (stable across restarts of the same query,
    * distinct across queries). Canonicalization (absolute + normalized +
    * trailing-slash-stripped, r16 ADVICE) means the SAME query restarted
    * with a differently-spelled path (relative vs absolute, `a//b`, a
    * trailing slash) reads its own commits as its own instead of failing
    * loud as a foreign writer. `private[sources]` so GraftSinkSpec stamps
    * the same markers the sink computes. */
  private[sources] def sinkQueryTag(checkpoint: Option[String]): String =
    checkpoint.map { raw =>
      val p = java.nio.file.Paths.get(raw.trim)
        .toAbsolutePath.normalize().toString
      java.security.MessageDigest.getInstance("MD5")
        .digest(p.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    }.getOrElse("nockpt")

  /** (store dir, explicit version pin) from reader options: `versionAsOf`
    * wins, else `timestampAsOf` (epoch micros, or "yyyy-MM-dd HH:mm:ss"
    * UTC) resolves through [[Versioned.versionAsOf]]. `None` = not pinned:
    * the table serves the LATEST commit, re-resolved at every scan — so a
    * view created before an `INSERT INTO` sees the insert's commit on its
    * next query (table semantics), while a pinned view is a frozen
    * snapshot (and rejects writes). */
  private[sources] def resolve(options: CaseInsensitiveStringMap): (String, Option[Int]) = {
    val dir = Option(options.get("path"))
      .getOrElse(sys.error("graftstore requires option 'path' (the store dir)"))
    val pin = Option(options.get("versionAsOf")).map(_.trim.toInt)
      .orElse(Option(options.get("timestampAsOf")).map { raw =>
        val ts = raw.trim
        val us =
          if (ts.forall(_.isDigit)) ts.toLong
          else java.time.LocalDateTime
            .parse(ts.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        Versioned.versionAsOf(dir, us)
      })
    pin.foreach(v =>
      require(Versioned.hasVersion(dir, v), s"graftstore: no version $v under $dir"))
    (dir, pin)
  }

  /** Buckets surviving the ZONE-MAP decision for `lo <= col <= hi` —
    * the connector's pruning rule AND the evidence rule catalog entries
    * gate (one decision, two consumers; [[Versioned.readVersionWhere]]'s
    * rule verbatim): keep iff the recorded [min, max] intersects, and a
    * bucket without a zone line (all-NULL or emptied) is skippable. */
  def zoneKeepBuckets(dir: String, v: Int, lo: Long, hi: Long): Set[Int] = {
    val stats = Versioned.readStats(dir, v)
    Versioned.readManifest(dir, v).keySet.filter { b =>
      stats.get(b).exists { case (mn, mx) => mx >= lo && mn <= hi }
    }
  }

  /** Buckets surviving the BLOOM decision for a probe set —
    * [[Versioned.lookupKeys]]' rule verbatim. */
  def bloomKeepBuckets(dir: String, v: Int, probes: Seq[Long]): Set[Int] = {
    val idx = Versioned.readBloomIndex(dir, v)
    Versioned.readManifest(dir, v).keySet.filter { b =>
      idx.get(b).exists { case (m, words) =>
        probes.exists(k => Versioned.bloomMayContain(m, words, k))
      }
    }
  }

  /** Fold pushed filters into the two skip decisions: returns (surviving
    * live assignment, filters that participated in skipping). Unsupported
    * shapes simply don't prune — never wrong, at worst unskipped. */
  private[sources] def prune(dir: String, v: Int, filters: Seq[Filter])
      : (Map[Int, Int], Seq[Filter]) = {
    val manifest = Versioned.readManifest(dir, v)
    val zcol = Versioned.statsCol(dir, v)
    val bcol =
      if (Versioned.hasBloomIndex(dir, v)) Some(Versioned.bloomIdxKeyCol(dir, v))
      else None

    import GraftStoreSource.{longLit => num}
    // tightest [lo, hi] the range filters on the zone column imply
    var lo = Long.MinValue
    var hi = Long.MaxValue
    var probes = Seq.empty[Long]
    val used = scala.collection.mutable.ListBuffer.empty[Filter]
    def walk(f: Filter): Unit = f match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(c, x) if zcol.contains(c) && num(x).isDefined =>
        lo = math.max(lo, num(x).get); hi = math.min(hi, num(x).get); used += f
      case GreaterThan(c, x) if zcol.contains(c) && num(x).isDefined =>
        lo = math.max(lo, num(x).get + 1); used += f
      case GreaterThanOrEqual(c, x) if zcol.contains(c) && num(x).isDefined =>
        lo = math.max(lo, num(x).get); used += f
      case LessThan(c, x) if zcol.contains(c) && num(x).isDefined =>
        hi = math.min(hi, num(x).get - 1); used += f
      case LessThanOrEqual(c, x) if zcol.contains(c) && num(x).isDefined =>
        hi = math.min(hi, num(x).get); used += f
      case EqualTo(c, x) if bcol.contains(c) && num(x).isDefined =>
        probes = probes :+ num(x).get; used += f
      case In(c, xs) if bcol.contains(c) && xs.forall(num(_).isDefined) =>
        probes = probes ++ xs.flatMap(num); used += f
      case _ => ()
    }
    filters.foreach(walk)

    var keep = manifest.keySet
    if (lo != Long.MinValue || hi != Long.MaxValue)
      keep = keep.intersect(zoneKeepBuckets(dir, v, lo, hi))
    if (probes.nonEmpty)
      keep = keep.intersect(bloomKeepBuckets(dir, v, probes.distinct))
    (manifest.filter { case (b, ver) => keep(b) && ver > 0 }, used.toSeq)
  }
}

private[sources] class GraftStoreTable(schema: StructType, dir: String,
                                       pin: Option[Int],
                                       tableOpts: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String =
    s"graftstore:$dir@${pin.map(v => s"v$v").getOrElse("latest")}"
  override def schema(): StructType = schema

  /** `_commit_version` — which commit last MATERIALIZED this row's bucket
    * file (bucket-granular provenance, the exact analogue of Iceberg's
    * `_file` / Delta's `_metadata.file_path` at this store's layout
    * granularity): the manifest entry of the bucket the row was read
    * from, external clone references decoded to the SOURCE's commit
    * number. Served from the manifest the scan already holds — zero
    * extra IO. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_commit_version"
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "commit that last materialized this row's bucket file"
    })
  // ACCEPT_ANY_SCHEMA (r15): the connector resolves INSERT input itself
  // ([[GraftStoreWrites.resolveAgainstTable]] — by-name when the names
  // match the table, positional otherwise, additive extras gated behind
  // the `evolveSchema` option), because Spark's own output resolution
  // would reject the one INSERT shape additive schema evolution needs:
  // a new column. Same dual role as Delta's use of the capability.
  // AUTOMATIC_SCHEMA_EVOLUTION (r16): opts the table into the analyzer's
  // `MERGE ... WITH SCHEMA EVOLUTION` resolution
  // (ResolveMergeIntoSchemaEvolution), which routes the source's extra
  // columns through the catalog's ALTER TABLE ADD COLUMN — the
  // schema-only commit — before resolving the merge itself.
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)

  /** A twin WITHOUT `ACCEPT_ANY_SCHEMA` — the capability makes
    * `DataSourceV2Relation.skipSchemaResolution` true, which the analyzer's
    * MergeIntoTable case reads as "return unresolved" (Spark's own INSERT
    * evolution discipline), leaving a SQL MERGE against a catalog table
    * permanently unresolved. [[GraftMergeAnalysis]] swaps this twin into
    * the MERGE target so the built-in resolution runs; every other surface
    * keeps the original table (INSERT evolution untouched). Delta solves
    * the same conflict by resolving MERGE in its own extension.
    * AUTOMATIC_SCHEMA_EVOLUTION survives on the twin — `WITH SCHEMA
    * EVOLUTION` eligibility must not die with the mask. */
  private[sources] def withoutAcceptAnySchema: GraftStoreTable =
    new GraftStoreTable(schema, dir, pin, tableOpts) {
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ,
          TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
          TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
    }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val v = pin.getOrElse(Versioned.latestVersion(dir))
    // v == 0: a catalog table CREATEd but never written (declared schema,
    // no commits yet) — serves the empty scan; every other zero-version
    // path fails earlier (inferSchema / resolve's pin check)
    require(v == 0 || Versioned.hasVersion(dir, v),
      s"graftstore: no version $v under $dir")
    new GraftStoreScanBuilder(schema, dir, v)
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftStoreWriteBuilder(dir, pin, tableOpts, info, Some(schema))

  // ---- SQL `DELETE FROM` (SupportsDelete) --------------------------------
  // The documented subset: every conjunct must be a key-column equality or
  // IN (the shapes [[Versioned.commitDelete]]'s id-frame contract serves,
  // bloom-index-prunable at scale), or the empty predicate (DELETE FROM t
  // with no WHERE → [[Versioned.commitDeleteAll]], a pure-metadata commit).
  // Anything else returns canDeleteWhere=false and Spark reports the
  // unsupported predicate — never a silent partial delete.
  private def tableKeyCol: Option[String] =
    Option(tableOpts.get("keyCol")).map(_.trim).filter(_.nonEmpty)

  // identity the row-level commands ([[GraftRowLevelRewrite]]) need
  private[sources] def storeDir: String = dir
  private[sources] def storePin: Option[Int] = pin
  private[sources] def storeKeyCol: Option[String] = tableKeyCol

  /** Long probes of one conjunct, if it is a supported shape. */
  private def probesOf(f: Filter): Option[Seq[Long]] = {
    import GraftStoreSource.{longLit => num}
    f match {
      case EqualTo(c, x) if tableKeyCol.contains(c) => num(x).map(Seq(_))
      case In(c, xs) if tableKeyCol.contains(c) =>
        val ns = xs.toSeq.map(num)
        if (ns.forall(_.isDefined)) Some(ns.flatten) else None
      case _ => None
    }
  }

  override def canDeleteWhere(filters: Array[Filter]): Boolean = {
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    pin.isEmpty && (real.isEmpty ||
      (tableKeyCol.isDefined && real.forall(probesOf(_).isDefined)))
  }

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pin.isEmpty, "graftstore: cannot DELETE through a version-pinned " +
      "view — a snapshot is not a table")
    val spark = SparkSession.active
    val latest = Versioned.latestVersion(dir)
    val v = latest + 1
    // an unqualified `DELETE FROM t` arrives as the AlwaysTrue predicate
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) { Versioned.commitDeleteAll(dir, v); return }
    // conjuncts intersect: the doomed keys satisfy EVERY predicate
    val keys = real.map(f => probesOf(f).getOrElse(sys.error(
        s"graftstore DELETE supports key-column =/IN conjuncts, got $f")).toSet)
      .reduce(_ intersect _)
    if (keys.isEmpty) return // contradictory predicates: nothing to delete
    val keyCol = tableKeyCol.get
    val bucketCol = Versioned.bucketColumn(spark, dir)
    // id frame (key, bucket) for the doomed keys: bloom-pruned when the
    // store carries a key bloom index, full filter otherwise — either way
    // commitDelete rewrites only the touched buckets
    val rows =
      if (Versioned.hasBloomIndex(dir, latest) &&
          Versioned.bloomIdxKeyCol(dir, latest) == keyCol)
        Versioned.lookupKeys(spark, dir, latest, keyCol, keys.toSeq)._1
      else Versioned.readVersion(spark, dir, latest)
        .where(col(keyCol).isin(keys.toSeq.map(Long.box): _*))
    val ids = rows.select(col(keyCol), col(bucketCol)).distinct()
    Versioned.commitDelete(spark, ids, dir, v, keyCol, bucketCol)
  }
}

/** The WRITE half of the connector — the seam that turns the read-only
  * demo surface into a TABLE: `INSERT INTO` a `USING graftstore` view (or
  * `df.write.format("graftstore").mode("append")`) lands a real commit
  * through the SAME functions the library API uses, so the SQL surface can
  * never drift from the store semantics it packages.
  *
  *  - append      → [[Versioned.commitUpsert]] at `latest + 1` (upsert
  *                  semantics on the store's key column — the MERGE-on-key
  *                  behavior a keyed table's INSERT means here; a brand-new
  *                  store bootstraps via [[Versioned.commitBase]] instead,
  *                  `nBuckets` option, default 16)
  *  - truncate / `INSERT OVERWRITE` → [[Versioned.commitRewrite]] (every
  *                  bucket re-materialized under the new content; old
  *                  versions still time travel — overwrite is a COMMIT,
  *                  never an erase; reclaim stays [[Versioned.vacuum]]'s
  *                  job)
  *
  * Options: `keyCol` (table- or write-level; required for append into an
  * existing store), `commitVersion` (write-level; the txn-app-id
  * idempotence discipline — a writer keyed to a deterministic id, e.g. a
  * streaming `foreachBatch`'s batch id, re-runs after a restart, sees the
  * manifest already present and commits NOTHING twice, so at-least-once
  * delivery yields exactly-once table state). Writes into a
  * `versionAsOf`-pinned view are rejected: a snapshot is not a table.
  *
  * The physical path is the [[V1Write]] bridge (the write twin of the
  * scan's [[V1Scan]]): commits here are DRIVER-COORDINATED DataFrame
  * writes — [[Versioned.commitUpsert]]'s copy-on-write anti-join is
  * itself a distributed plan, so the bridge adds no data-scale driver
  * work, exactly like the read side. */
private[sources] class GraftStoreWriteBuilder(dir: String, pin: Option[Int],
                                              tableOpts: CaseInsensitiveStringMap,
                                              info: LogicalWriteInfo,
                                              tableSchema: Option[StructType])
    extends WriteBuilder with SupportsTruncate {
  private var truncated = false
  override def truncate(): WriteBuilder = { truncated = true; this }

  private def opt(name: String): Option[String] =
    Option(info.options.get(name)).orElse(Option(tableOpts.get(name)))
      .map(_.trim).filter(_.nonEmpty)

  override def build(): V1Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit =
          GraftStoreWrites.insert(dir, pin, opt, data, overwrite || truncated,
            tableSchema)
      }
    override def description(): String =
      s"graftstore-write $dir mode=${if (truncated) "overwrite" else "append"}"
  }
}

/** The one commit-mapping rule both write surfaces share (the SQL
  * `INSERT INTO` V1Write bridge above and the `df.write.format` V1 save
  * path's [[CreatableRelationProvider]]) — one decision, two packagings,
  * like the read side's resolve(). */
private[sources] object GraftStoreWrites {
  def insert(dir: String, pin: Option[Int], opt: String => Option[String],
             data: DataFrame, overwrite: Boolean,
             tableSchema: Option[StructType] = None): Unit = {
    require(pin.isEmpty,
      s"graftstore: cannot write through a version-pinned view (versionAsOf=" +
        s"${pin.get}) — a snapshot is not a table; create the view without a pin")
    val spark = data.sparkSession
    val latest = Versioned.latestVersion(dir)
    val explicitV = opt("commitVersion").map(_.toInt)
    // Bootstrap pins the first commit at version 1, so an explicit
    // commitVersion != 1 on an empty store could never honor its
    // idempotence contract (hasVersion(v) would stay false and a replay
    // would re-apply as an upsert) — reject rather than silently remap.
    if (latest == 0) explicitV.foreach(ev => require(ev == 1,
      s"graftstore bootstrap commits at version 1 — commitVersion=$ev " +
        "cannot be honored on an empty store (replay would not recognize " +
        "its own commit); drop the option or pass 1"))
    val v = explicitV.getOrElse(latest + 1)
    // Deterministic-id writers (explicit commitVersion) get the streaming
    // sink's txn-marker discipline (r15, closing the r14 guard-consistency
    // gap): identity = txnAppId + version, stamped BEFORE the commit. A
    // replay that finds its own marker skips (committed) or safely
    // re-commits (crashed between marker and manifest); a FOREIGN commit
    // aliasing the version fails loud instead of silently dropping the
    // insert's rows — the exact scenario the sink's guard was added for.
    // CONTRACT: the idempotence identity is (txnAppId, version) — writers
    // that omit txnAppId share the default id and are ONE logical writer
    // (a second distinct pipeline reusing the same version + default id is
    // read as a replay and skipped). Distinct concurrent writers MUST set
    // distinct txnAppId — the same contract Delta's txn option makes
    // mandatory; the default exists for the single-writer deterministic
    // pipeline the option documents.
    val marker = explicitV.map(ev =>
      s"${opt("txnAppId").getOrElse("graftinsert")}:v$ev")
    if (Versioned.hasVersion(dir, v)) {
      marker match {
        case Some(m) =>
          require(Versioned.txnMarker(dir, v).contains(m),
            s"graftstore: commitVersion=$v already committed by another " +
              s"writer (txn ${Versioned.txnMarker(dir, v).getOrElse("<none>")}" +
              s", expected $m) — skipping would silently drop this insert's " +
              "rows; pick an unclaimed version or a distinct txnAppId")
          return // idempotent replay of our own commit
        case None => return // auto-version collision: already committed
      }
    }
    marker.foreach { m =>
      Versioned.txnMarker(dir, v) match {
        case Some(other) if other != m => sys.error(
          s"graftstore: commitVersion=$v is claimed in-flight by another " +
            s"writer (txn $other, expected $m)")
        case Some(_) => () // our own crashed attempt: marker already stamped
        case None => Versioned.writeTxnMarker(dir, v, m)
      }
    }
    if (latest == 0) {
      // first commit bootstraps the store (schema supplied externally).
      // A catalog table CREATEd with a declared schema resolves the
      // bootstrap INSERT against it — by name or positionally, cast to
      // the declared types — exactly like every later commit resolves
      // against the live schema (a positional INSERT's unnamed CAST
      // column must land as the declared bucket column, not its
      // expression string).
      val bucketCol = opt("bucketCol").getOrElse(sys.error(
        "graftstore bootstrap needs option 'bucketCol' (the INT bucket column)"))
      val n = opt("nBuckets").map(_.toInt).getOrElse(16)
      val resolved = tableSchema
        .filter(_.fieldNames.nonEmpty)
        .map(ts => resolveAgainstTable(data, ts, evolve = false))
        .getOrElse(data)
      Versioned.commitBase(resolved, dir, bucketCol, n)
    } else {
      val bucketCol = Versioned.bucketColumn(spark, dir)
      val tableSchema = Versioned.readVersion(spark, dir, latest).schema
      val resolved = resolveAgainstTable(data, tableSchema,
        opt("evolveSchema").exists(_.toBoolean))
      if (overwrite)
        Versioned.commitRewrite(resolved, dir, v, bucketCol,
          Versioned.readManifest(dir, latest).size)
      else {
        val keyCol = opt("keyCol").getOrElse(sys.error(
          "graftstore append needs option 'keyCol' (the upsert key column) " +
            "on the table or the writer"))
        Versioned.commitUpsert(spark, resolved, dir, v, keyCol, bucketCol)
      }
    }
  }

  /** Resolve INSERT input against the table's current schema — the job
    * [[TableCapability.ACCEPT_ANY_SCHEMA]] takes back from Spark (r15):
    *
    *  - BY NAME when the incoming columns cover every table column
    *    (case-insensitive), reordered and cast to the table's types —
    *    the `SELECT *`-from-a-matching-view shape and every
    *    `df.write.format` shape.
    *  - POSITIONAL otherwise (SQL INSERT semantics): arity must match
    *    exactly, incoming columns rename/cast to the table's, in order.
    *  - EXTRA columns beyond the table's are ADDITIVE SCHEMA EVOLUTION,
    *    allowed only when the write sets `evolveSchema true` (evolution
    *    must be asked for — a typo'd column name must fail, not fork the
    *    schema); they append after the table's columns and
    *    [[Versioned.commitUpsert]]'s add-only evolution takes over. A
    *    drop (a table column absent by name AND arity short) stays
    *    rejected — commitUpsert's documented add-only discipline. */
  private[sources] def resolveAgainstTable(data: DataFrame, table: StructType,
                                           evolve: Boolean): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dataCols = data.columns
    val byName = table.fields.forall(f => dataCols.exists(_.equalsIgnoreCase(f.name)))
    if (byName) {
      val used = scala.collection.mutable.Set.empty[String]
      val resolved = table.fields.map { f =>
        val c = dataCols.find(_.equalsIgnoreCase(f.name)).get
        used += c.toLowerCase
        col(c).cast(f.dataType).as(f.name)
      }
      val extras = dataCols.filterNot(c => used(c.toLowerCase))
      require(extras.isEmpty || evolve,
        s"graftstore INSERT carries columns the table lacks: " +
          s"${extras.mkString(", ")} — additive schema evolution must be " +
          "asked for: set option evolveSchema=true on the write (or the view)")
      data.select((resolved ++ extras.map(col)).toSeq: _*)
    } else {
      // an ARITY-MATCHED positional insert is an ordinary insert whether or
      // not the table opted into evolution (a table-level `evolveSchema
      // 'true'` must not break plain `INSERT ... VALUES`, whose columns are
      // named col1/col2/... and so never resolve by name); only an insert
      // that actually NEEDS evolution — extra columns — is by-name-only
      require(dataCols.length <= table.fields.length || !evolve,
        "graftstore schema evolution is BY NAME: the insert must carry every " +
          s"current table column (${table.fieldNames.mkString(", ")}) plus the " +
          "new ones, with names; positional inserts cannot evolve")
      require(dataCols.length == table.fields.length,
        s"graftstore positional INSERT arity mismatch: table has " +
          s"${table.fields.length} columns (${table.fieldNames.mkString(", ")}), " +
          s"insert supplies ${dataCols.length} (${dataCols.mkString(", ")})")
      data.select(dataCols.zip(table.fields).map { case (c, f) =>
        col(c).cast(f.dataType).as(f.name) }.toSeq: _*)
    }
  }
}

private[sources] class GraftStoreScanBuilder(full: StructType, dir: String, v: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var assign: Map[Int, Int] = _
  private var aggResult: Option[(StructType, Seq[Any])] = None

  /** Every filter comes back as a residual (Spark re-applies row-level);
    * the ones the sidecars could act on are retained as `pushedFilters`
    * — the skip already happened when this returns. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    if (v == 0) { assign = Map.empty; return filters } // empty catalog table
    val (kept, used) = GraftStoreSource.prune(dir, v, filters.toSeq)
    assign = kept
    pushed = used.toArray
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** METADATA-ONLY aggregation — the statistics query a table format
    * serves from its commit log with ZERO data IO: a global (no GROUP BY,
    * no residual filter) COUNT(*) folds the row-count sidecar, MIN/MAX of
    * the recorded zone column fold the zone maps (nulls excluded by the
    * zone contract — exactly MIN/MAX's semantics). Complete pushdown: the
    * scan returns the ONE final row. Anything the sidecars can't answer
    * exactly — grouped aggregates, other functions/columns, a pushed
    * filter, a missing sidecar, a non-long column — declines and scans
    * data. (Spark only offers aggregates when every filter was fully
    * pushed; ours are all residual, so this fires on filterless reads.) */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    aggResult = translateAgg(agg)
    aggResult.isDefined
  }

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case r: NamedReference if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
    case _ => None
  }

  private def translateAgg(agg: Aggregation): Option[(StructType, Seq[Any])] = {
    if (v == 0 || pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    val zcol = Versioned.statsCol(dir, v)
    def zoneIsLong = zcol.exists(c =>
      full.fields.find(_.name == c).exists(_.dataType ==
        org.apache.spark.sql.types.LongType))
    val live = Versioned.readManifest(dir, v).filter(_._2 > 0).keySet
    lazy val zones = Versioned.readStats(dir, v)
    val cols = agg.aggregateExpressions.map { fn: AggregateFunc =>
      fn match {
        case _: CountStar if Versioned.hasRowCounts(dir, v) =>
          val counts = Versioned.readRowCounts(dir, v)
          // every live bucket must be covered or the sum is not the count
          if (live.subsetOf(counts.keySet))
            Some(("count_star", org.apache.spark.sql.types.LongType,
              live.toSeq.map(counts).sum: Any))
          else None
        case m: Min if Versioned.hasStats(dir, v) && zoneIsLong &&
            fieldOf(m.column) == zcol =>
          val vs = live.toSeq.flatMap(zones.get).map(_._1)
          Some(("min_" + zcol.get, org.apache.spark.sql.types.LongType,
            if (vs.isEmpty) null else (vs.min: Any)))
        case m: Max if Versioned.hasStats(dir, v) && zoneIsLong &&
            fieldOf(m.column) == zcol =>
          val vs = live.toSeq.flatMap(zones.get).map(_._2)
          Some(("max_" + zcol.get, org.apache.spark.sql.types.LongType,
            if (vs.isEmpty) null else (vs.max: Any)))
        case _ => None
      }
    }
    if (cols.exists(_.isEmpty)) None
    else {
      val defined = cols.map(_.get)
      Some((StructType(defined.map { case (n, t, _) =>
        org.apache.spark.sql.types.StructField(n, t) }),
        defined.map(_._3).toSeq))
    }
  }

  override def build(): Scan = {
    if (assign == null) // no filter pushdown happened (e.g. bare scan)
      assign =
        if (v == 0) Map.empty // empty catalog table: nothing to assign
        else Versioned.readManifest(dir, v).filter(_._2 > 0)
    new GraftStoreScan(full, required, dir, v, assign, aggResult)
  }
}

private[sources] class GraftStoreScan(full: StructType, required: StructType,
                                      dir: String, v: Int,
                                      assign: Map[Int, Int],
                                      aggResult: Option[(StructType, Seq[Any])] = None)
    extends V1Scan with SupportsReportStatistics {
  override def readSchema(): StructType = aggResult.map(_._1).getOrElse(required)

  /** POST-PUSHDOWN statistics from the commit log + filesystem metadata —
    * what turns the connector's tables into broadcast candidates: without
    * this, `DataSourceV2ScanRelation.computeStats` falls back to
    * `defaultSizeInBytes` ("assume huge"), so a 50 KB dimension store
    * joined against a 100 TB fact NEVER auto-broadcasts and Catalyst plans
    * a full shuffle join. Size = the assigned (already bucket-PRUNED)
    * buckets' on-disk bytes, scaled by the pruned/full column-width ratio
    * (`FileScan.estimateStatistics`' own discipline); rows = the commit
    * log's row-count sidecar summed over the same buckets when it covers
    * them. A completely-pushed aggregate is the one-row plan it returns. */
  override def estimateStatistics(): Statistics = {
    import java.util.OptionalLong
    if (aggResult.isDefined)
      return new Statistics {
        override def sizeInBytes(): OptionalLong = OptionalLong.of(64L)
        override def numRows(): OptionalLong = OptionalLong.of(1L)
      }
    val raw = Versioned.sizeOfBuckets(dir, assign)
    val ratio =
      if (full.fields.isEmpty) 1.0
      else required.defaultSize.toDouble / full.defaultSize.toDouble
    val bytes = math.max(1L, (raw * math.min(1.0, ratio)).toLong)
    val live = assign.filter(_._2 > 0).keySet
    val rows: Option[Long] =
      if (live.isEmpty) Some(0L) // fully pruned, or an empty catalog table
      else if (Versioned.hasRowCounts(dir, v)) {
        val counts = Versioned.readRowCounts(dir, v)
        if (live.subsetOf(counts.keySet)) Some(live.toSeq.map(counts).sum)
        else None
      } else None
    new Statistics {
      override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
      override def numRows(): OptionalLong =
        rows.map(OptionalLong.of).getOrElse(OptionalLong.empty())
    }
  }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T = {
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = readSchema()
      override def buildScan(): RDD[Row] = aggResult match {
        case Some((_, values)) =>
          // the completely-pushed aggregate: ONE row straight from the
          // commit-log sidecars — no data file is ever opened
          context.sparkContext.parallelize(Seq(Row(values: _*)), 1)
        case None =>
          val spark = context.sparkSession
          // `_commit_version` is requested METADATA (SupportsMetadataColumns):
          // served from the manifest entries the scan already holds — the
          // per-version read each slice gets its version literal stamped on.
          // A DATA column of the same name hides the metadata column (the
          // DSv2 contract) — never stamp over committed data.
          val wantVer = required.fieldNames.contains("_commit_version") &&
            !full.fieldNames.contains("_commit_version")
          val base =
            if (assign.isEmpty) {
              // everything pruned — or an empty (never-written) catalog
              // table: an empty frame in the declared schema (schema-only,
              // no bucket IO — the skip contract's floor)
              val empty =
                if (v == 0)
                  spark.createDataFrame(
                    spark.sparkContext.emptyRDD[Row], full)
                else Versioned.readVersion(spark, dir, v).where(lit(false))
              if (wantVer) empty.withColumn("_commit_version", lit(0)) else empty
            } else if (wantVer) {
              Versioned.balancedUnion(
                assign.filter(_._2 > 0).groupBy(_._2).toSeq.sortBy(_._1)
                  .map { case (ver, entries) =>
                    val decoded = // clone refs report the SOURCE commit
                      if (ver >= Versioned.ExtBase) ver - Versioned.ExtBase else ver
                    Versioned.readBuckets(spark, dir, entries)
                      .withColumn("_commit_version", lit(decoded))
                  }, allowMissing = true)
            } else Versioned.readBuckets(spark, dir, assign)
          // ALTER'd columns ([[Versioned.commitAddColumns]] sidecars) that
          // no read data file carries yet null-fill from the table schema —
          // the same overlay readVersion applies, at the scan's granularity
          val padded = required.fields.foldLeft(base) { (d, f) =>
            if (d.columns.exists(_.equalsIgnoreCase(f.name))) d
            else d.withColumn(f.name, lit(null).cast(f.dataType))
          }
          padded.select(required.fieldNames.map(col).toSeq: _*).rdd
      }
    }.asInstanceOf[T]
  }

  override def description(): String =
    s"graftstore $dir@v$v buckets=${assign.keySet.toSeq.sorted.mkString(",")}" +
      aggResult.map(a => s" aggPushed=${a._1.fieldNames.mkString(",")}").getOrElse("")
}
