package graft.queries

import graft.SparkSpec

/** Catalog queries must behave like library calls: building AND running one
  * leaves the caller's session state — runtime SQLConf, temp views,
  * registered SQL functions — observably unchanged (VERDICT r2 ask #6). The
  * former offenders set `nanosAsLong` and registered views/functions on the
  * caller's session; they now do it on a [[Scoped]] fork.
  */
class SessionHygieneSpec extends SparkSpec {

  private def snapshot(): (Map[String, String], Set[String], Boolean) = (
    spark.conf.getAll,
    spark.catalog.listTables().collect().map(_.name).toSet,
    spark.catalog.functionExists("array_sqdist"))

  private def assertUnchanged(name: String)(body: => Long): Unit = {
    val before = snapshot()
    assert(body > 0, s"$name returned no rows")
    val after = snapshot()
    assert(after._1 == before._1, s"$name changed runtime conf: " +
      (after._1.toSet diff before._1.toSet).take(3).mkString(", "))
    assert(after._2 == before._2, s"$name leaked temp views: ${after._2 diff before._2}")
    assert(after._3 == before._3, s"$name leaked SQL function registration")
  }

  test("events queries do not leak the legacy parquet flag") {
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"))
    assertUnchanged("events_hourly") {
      EventQueries.hourly(spark, sf("sf0.001")).count()
    }
    assertUnchanged("events_asof") {
      AdvancedQueries.eventsAsof(spark, sf("sf0.001")).count()
    }
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"))
  }

  test("som_assign_sql does not leak its temp view or SQL functions") {
    assertUnchanged("som_assign_sql") {
      SomQueries.assignSql(spark, sf("sf0.001")).count()
    }
    assert(!spark.catalog.tableExists("graft_embeddings"))
  }
}
