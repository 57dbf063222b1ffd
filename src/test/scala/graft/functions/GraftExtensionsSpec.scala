package graft.functions

import graft.SparkSpec

/** The native kernels must be reachable from SQL text through both wiring
  * paths a library user has: `spark.sql.extensions=graft.GraftExtensions`
  * at session build (smoked against a fresh SparkSessionExtensions — the
  * injection closures must at least construct), and
  * `ArrayVectorExpressions.registerAll` on a live session (behavior-checked
  * end-to-end here on a forked session, keeping the shared one clean). */
class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects all six kernels without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(ext) // throws on malformed ExpressionInfo
  }

  test("registerAll exposes every kernel to SQL text with correct results") {
    val fork = spark.newSession()
    ArrayVectorExpressions.registerAll(fork)
    val r = fork.sql("""
      SELECT array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
             array_sqdist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS sq,
             size(space_tokens('a  b c')) AS nt,
             size(shingles3('a b c d')) AS ns,
             rolling_hash('ab') AS rh,
             md5_prefix60('x') AS h,
             bpe_count('the nation') AS bc,
             size(bpe_tokenize('the nation')) AS bt,
             size(segments_n('a b c d e', 2)) AS sg,
             nfc_normalize('Café') AS nn
    """).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 25.0)
    assert(r.getInt(2) == 3)
    assert(r.getInt(3) == 2)
    assert(r.getLong(4) == 'a'.toLong * 31 + 'b'.toLong)
    assert(r.getLong(5) >= 0L && r.getLong(5) < (1L << 60))
    assert(r.getInt(6) == 3 && r.getInt(7) == 3) // [the] [n, ation]
    assert(r.getInt(8) == 3) // [a b] [c d] [e]
    assert(r.getString(9) == "Caf\u00E9" && r.getString(9).length == 4) // composed
    // the fork owns the registrations — the shared session stays clean
    assert(!spark.catalog.functionExists("space_tokens"))
  }

  test("kmv_agg is reachable from SQL text as a grouped aggregate") {
    val fork = spark.newSession()
    ArrayVectorExpressions.registerAll(fork)
    import fork.implicits._
    Seq(("a", 5L), ("a", 3L), ("a", 3L), ("a", 9L), ("b", 1L))
      .toDF("g", "h").createOrReplaceTempView("kmv_in")
    val rows = fork.sql(
      "SELECT g, kmv_agg(h, 2).nh AS nh, kmv_agg(h, 2).hk AS hk " +
        "FROM kmv_in GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // group a: distinct {3,5,9}, k=2 keeps {3,5} → nh=2, hk=5
    assert(rows.toSeq == Seq(("a", 2, 5L), ("b", 1, 1L)))
  }
}
