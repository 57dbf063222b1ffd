package graft.streaming

import graft.SparkSpec
import graft.queries.EventQueries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming-vs-batch equivalence on REAL testdata: the full sf0.001 events
  * table flows through MemoryStream into the streaming operators and the
  * sink must equal the oracle-checked batch twin row-for-row. This is the
  * check that fails if streaming and batch semantics ever diverge — the
  * batch side is hash-matched against DuckDB per round, so transitively the
  * streaming path is oracle-proven too.
  */
class StreamBatchEquivalenceSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** sf0.001 events as typed rows with exact microsecond timestamps —
    * [[graft.queries.EventTs]] normalizes whatever physical encoding the
    * generator used (ns-as-long or us NTZ), same as the batch reader. */
  private def loadEvents(): Seq[EventStream.Event] = {
    import spark.implicits._
    // withConf (not bare conf.set): restores the shared session afterwards —
    // a bare set leaked nanosAsLong=true into whatever suite ran next
    // (SessionHygieneSpec catches it when ordered after this one). UTC is
    // pinned explicitly for the NTZ->Timestamp cast in EventTs (r7 advisory).
    withConf("spark.sql.legacy.parquet.nanosAsLong" -> "true",
        "spark.sql.session.timeZone" -> "UTC") {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.select(col("event_id"), graft.queries.EventTs.tsTimestamp(raw).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .as[EventStream.Event]
        .collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    }
  }

  test("streaming hourly equals oracle-checked batch hourly on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.hourly(mem.toDF())
      .writeStream.format("memory").queryName("eq_hourly")
      .outputMode("complete").start()
    try {
      mem.addData(loadEvents())
      q.processAllAvailable()
      val streamed = spark.table("eq_hourly")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      val batch = EventQueries.hourly(spark, dir)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2))
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("streaming sessionize equals oracle-checked batch sessionize on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val maxTs = events.map(_.ts.getTime).max
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("eq_sessions")
      .outputMode("append").start()
    try {
      // one batch = no late rows; then a far-future sentinel advances the
      // watermark past every open session's timeout so all sessions emit
      mem.addData(events)
      q.processAllAvailable()
      mem.addData(EventStream.Event(-1L, new Timestamp(maxTs + 4L * 3600 * 1000), -1L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("eq_sessions")
        .where(col("user_id") >= 0) // drop the sentinel's own session (if emitted)
        .select(col("user_id"), col("session_id"), col("n_events"), col("duration_s"),
          round(col("sum_value"), 4).as("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
        .sorted
      val batch = EventQueries.sessionize(spark, dir)
        .select(col("user_id"), col("session_id"), col("n_events").cast("int"),
          col("duration_s"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
        .sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("resample accepts an out-of-order event within the reorder window across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, epochS: Long, tpe: String) =
      EventStream.Event(id, new Timestamp(epochS * 1000), 7L, tpe, 0.0)
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.resampleStream(mem.toDS(), intervalUs = 900L * 1000000)
      .writeStream.format("memory").queryName("eq_ooo").outputMode("append").start()
    try {
      val h = 36000L // 10:00 as epoch seconds
      mem.addData(ev(1, h, "view"), ev(2, h + 16 * 60, "view"))  // buckets 40, 41
      q.processAllAvailable()
      // 10:07 arrives AFTER 10:16 was seen — one bucket behind the newest,
      // inside the reorder window: must land in bucket 40, not be dropped
      mem.addData(ev(3, h + 7 * 60, "purchase"))
      q.processAllAvailable()
      mem.addData(EventStream.Event(-1L, new Timestamp((h + 86400) * 1000), -1L, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.table("eq_ooo").where(col("user_id") === 7L)
        .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getString(3))).toMap
      assert(rows(40L) == ((2L, "purchase")), s"bucket 40 must count the reordered event: $rows")
      assert(rows(41L)._1 == 1L)
    } finally q.stop()
  }

  test("streaming resample equals oracle-checked batch resample on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = loadEvents()
    val maxTs = events.map(_.ts.getTime).max
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.resampleStream(mem.toDS(), intervalUs = 15L * 60 * 1000000)
      .writeStream.format("memory").queryName("eq_resample")
      .outputMode("append").start()
    try {
      // one in-order batch, then a far-future sentinel advances the
      // watermark past every open bucket's flush timeout
      mem.addData(events)
      q.processAllAvailable()
      mem.addData(EventStream.Event(-1L, new Timestamp(maxTs + 24L * 3600 * 1000), -1L, "view", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("eq_resample")
        .where(col("user_id") >= 0) // the sentinel's own open bucket never emits
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sorted
      val batch = EventQueries.resample(spark, dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
