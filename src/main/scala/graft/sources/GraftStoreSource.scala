package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
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
class GraftStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftstore"

  /** A caller may supply the schema (skipping [[inferSchema]]'s data-file
    * read) — with the sidecars present, a metadata-only aggregate then
    * never opens a data file at all (GraftStoreSpec proves it by deleting
    * every one). */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (dir, v) = GraftStoreSource.resolve(options)
    Versioned.readVersion(SparkSession.active, dir, v).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val (dir, v) = GraftStoreSource.resolve(
      new CaseInsensitiveStringMap(properties))
    new GraftStoreTable(schema, dir, v)
  }
}

object GraftStoreSource {
  /** (store dir, pinned version) from reader options: `versionAsOf` wins,
    * else `timestampAsOf` (epoch micros, or "yyyy-MM-dd HH:mm:ss" UTC)
    * resolves through [[Versioned.versionAsOf]], else the latest commit. */
  private[sources] def resolve(options: CaseInsensitiveStringMap): (String, Int) = {
    val dir = Option(options.get("path"))
      .getOrElse(sys.error("graftstore requires option 'path' (the store dir)"))
    val v = Option(options.get("versionAsOf")).map(_.trim.toInt)
      .orElse(Option(options.get("timestampAsOf")).map { raw =>
        val ts = raw.trim
        val us =
          if (ts.forall(_.isDigit)) ts.toLong
          else java.time.LocalDateTime
            .parse(ts.replace(' ', 'T'))
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
        Versioned.versionAsOf(dir, us)
      })
      .getOrElse(Versioned.latestVersion(dir))
    require(Versioned.hasVersion(dir, v), s"graftstore: no version $v under $dir")
    (dir, v)
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

    def num(a: Any): Option[Long] = a match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
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

private[sources] class GraftStoreTable(schema: StructType, dir: String, v: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graftstore:$dir@v$v"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftStoreScanBuilder(schema, dir, v)
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
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
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
      assign = Versioned.readManifest(dir, v).filter(_._2 > 0)
    new GraftStoreScan(full, required, dir, v, assign, aggResult)
  }
}

private[sources] class GraftStoreScan(full: StructType, required: StructType,
                                      dir: String, v: Int,
                                      assign: Map[Int, Int],
                                      aggResult: Option[(StructType, Seq[Any])] = None)
    extends V1Scan {
  override def readSchema(): StructType = aggResult.map(_._1).getOrElse(required)

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
          val base =
            if (assign.isEmpty)
              // everything pruned: an empty frame in the version's schema
              // (schema-only read, no bucket IO — the skip contract's floor)
              Versioned.readVersion(spark, dir, v).where(lit(false))
            else Versioned.readBuckets(spark, dir, assign)
          base.select(required.fieldNames.map(col).toSeq: _*).rdd
      }
    }.asInstanceOf[T]
  }

  override def description(): String =
    s"graftstore $dir@v$v buckets=${assign.keySet.toSeq.sorted.mkString(",")}" +
      aggResult.map(a => s" aggPushed=${a._1.fieldNames.mkString(",")}").getOrElse("")
}
