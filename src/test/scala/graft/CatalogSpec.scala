package graft

/** Contract checks over the SparkEntry catalog — wiring mistakes (an oracle
  * without a query, a duplicate name swallowed by the map merge) should fail
  * here, not in the driver's round. */
class CatalogSpec extends SparkSpec {

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-checked — no rows-only cells") {
    // forgetting the oracleSql entry silently downgrades a query to the
    // driver's weak rows-only check; since r13 even the HLL/GK sketch
    // entries hash-gate (in-band error-envelope flags), so the exemption
    // set is EMPTY and must stay empty
    val unchecked = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unchecked.isEmpty, s"queries silently lacking an oracle: $unchecked")
  }

  test("module maps do not collide (merge would silently drop a query)") {
    val maps = Seq(
      graft.queries.SomQueries.queries, graft.queries.MlQueries.queries,
      graft.queries.RelationalQueries.queries, graft.queries.EventQueries.queries,
      graft.queries.TextDedupQueries.queries, graft.queries.SimilarityQueries.queries,
      graft.queries.MultimodalQueries.queries, graft.queries.AdvancedQueries.queries,
      graft.queries.SourceQueries.queries, graft.queries.GraphQueries.queries)
    val total = maps.map(_.size).sum
    assert(SparkEntry.queries.size == total,
      s"duplicate query names across modules: merged ${SparkEntry.queries.size} of $total")
  }

  test("entry (driver smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query plans against sf0.001 (schema resolvable, no analysis error)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf("sf0.001"))
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      assert(df.schema.fieldNames.toSet.size == df.schema.fieldNames.length,
        s"$name has duplicate output columns")
    }
  }
}
