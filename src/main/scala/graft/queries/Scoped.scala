package graft.queries

import org.apache.spark.sql.SparkSession

/** Session hygiene for query builders that need session-level switches
  * (legacy parquet flags, temp views, SQL function registration): run the
  * builder against a forked session (`SparkSession.newSession`) that shares
  * the SparkContext and table cache but owns its own SQLConf, temp-view
  * catalog and function registry. The mutations live — and die — with the
  * fork; the caller's session is observably unchanged (spec-asserted by
  * SessionHygieneSpec). The returned DataFrame keeps a reference to the
  * fork, so lazy execution still sees the right conf.
  */
private[graft] object Scoped {
  def apply[A](s: SparkSession)(f: SparkSession => A): A = {
    val fork = s.newSession()
    // newSession seeds SQLConf from the shared SparkConf, not the parent's
    // RUNTIME conf — copy it over so e.g. a caller's shuffle-partition
    // setting keeps applying inside the fork (read-only keys are skipped).
    s.conf.getAll.foreach { case (k, v) =>
      try fork.conf.set(k, v) catch { case _: Exception => () }
    }
    f(fork)
  }
}
