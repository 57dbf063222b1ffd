package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
  private def ts(minute: Int): Timestamp = new Timestamp(base + minute * 60000L)

  test("streaming hourly windows match the batch shape") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.hourly(mem.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        EventStream.Event(1, ts(0), 100, "view", 1.0),
        EventStream.Event(2, ts(10), 100, "view", 2.0),
        EventStream.Event(3, ts(70), 101, "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out").collect()
      assert(rows.length == 2)
      val h10 = rows.find(_.getAs[String]("event_type") == "view").get
      assert(h10.getAs[Long]("n") == 2)
      assert(h10.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming dedup drops replayed event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        EventStream.Event(1, ts(0), 100, "view", 1.0),
        EventStream.Event(1, ts(0), 100, "view", 1.0), // exact replay
        EventStream.Event(2, ts(1), 100, "view", 2.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(1, ts(2), 100, "view", 1.0)) // late replay
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("session ordinals survive a timeout flush (multi-batch numbering)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_seq_out")
      .outputMode("append").start()
    try {
      // session 1, then a watermark push that times it out...
      mem.addData(EventStream.Event(1, ts(0), 200, "view", 1.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(2, ts(120), 999, "view", 0.0))
      q.processAllAvailable()
      // ...then the SAME user returns in a later micro-batch: the flush must
      // have left a tombstone carrying seq, so this is session 2 — not a
      // restart at 1 (which would duplicate the earlier session_id and
      // diverge from the batch gaps-and-islands numbering)
      mem.addData(EventStream.Event(3, ts(240), 200, "view", 2.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(4, ts(480), 999, "view", 0.0))
      q.processAllAvailable()
      val byUser = spark.table("sessions_seq_out")
        .where(col("user_id") === 200)
        .select(col("session_id"), col("sum_value")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1)
      assert(byUser.toSeq == Seq(1L -> 1.0, 2L -> 2.0),
        s"second-life session must be ordinal 2: ${byUser.mkString(", ")}")
    } finally q.stop()
  }

  test("stateful sessionization emits sessions after timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // session A: two events 5 min apart; then a 2-hour-later event pushes
      // the watermark past A's 30-min timeout
      mem.addData(
        EventStream.Event(1, ts(0), 100, "view", 1.0),
        EventStream.Event(2, ts(5), 100, "view", 2.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(3, ts(180), 100, "view", 4.0))
      q.processAllAvailable()
      mem.addData(EventStream.Event(4, ts(400), 100, "view", 8.0))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out").as[EventStream.Session].collect()
      assert(sessions.exists(s => s.n_events == 2 && s.duration_s == 300 && s.sum_value == 3.0),
        s"got: ${sessions.mkString(", ")}")
    } finally q.stop()
  }
}
