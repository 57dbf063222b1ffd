package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query catalog from the per-domain modules under
  * `graft.queries`. Every entry in `queries` that is ANSI-expressible has a
  * matching DuckDB oracle in `oracleSql` (same column names, driver
  * hash-compares values after sorting columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.SomQueries.assign(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.SomQueries.queries ++
    graft.queries.MlQueries.queries ++
    graft.queries.RelationalQueries.queries ++
    graft.queries.EventQueries.queries ++
    graft.queries.TextDedupQueries.queries ++
    graft.queries.SimilarityQueries.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.AdvancedQueries.queries ++
    graft.queries.SourceQueries.queries ++
    graft.queries.GraphQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.SomQueries.oracleSql ++
    graft.queries.MlQueries.oracleSql ++
    graft.queries.RelationalQueries.oracleSql ++
    graft.queries.EventQueries.oracleSql ++
    graft.queries.TextDedupQueries.oracleSql ++
    graft.queries.SimilarityQueries.oracleSql ++
    graft.queries.MultimodalQueries.oracleSql ++
    graft.queries.AdvancedQueries.oracleSql ++
    graft.queries.SourceQueries.oracleSql ++
    graft.queries.GraphQueries.oracleSql
}
