package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** STREAM-STREAM interval join on real testdata: views and clicks flow as
  * two independent streams, joined per user within a 30-minute event-time
  * window — the attribution-join shape. Both sides carry watermarks and the
  * join condition bounds event time, so Spark can size and EVICT the join
  * state (unbounded state is the stream-stream failure mode at scale; the
  * time bound is what makes the operator production-viable). The sink must
  * equal the identical batch join — the oracle-proven semantics extended to
  * the two-stream case.
  */
class StreamStreamJoinSpec extends SparkSpec {

  test("view->click 30-min interval join equals the batch join on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = withConf("spark.sql.legacy.parquet.nanosAsLong" -> "true",
        // UTC pinned explicitly for the NTZ->Timestamp cast (r7 advisory)
        "spark.sql.session.timeZone" -> "UTC") {
      val raw = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      raw.select(col("event_id"), graft.queries.EventTs.tsTimestamp(raw).as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .as[EventStream.Event].collect().toSeq
    }
    val views = events.filter(_.event_type == "view")
    val clicks = events.filter(_.event_type == "click")
    assert(views.nonEmpty && clicks.nonEmpty)

    val vMem = MemoryStream[EventStream.Event]
    val cMem = MemoryStream[EventStream.Event]
    val vs = vMem.toDF().select(col("event_id").as("view_id"),
        col("ts").as("view_ts"), col("user_id"))
      .withWatermark("view_ts", "10 minutes")
    val cs = cMem.toDF().select(col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("user_id").as("c_user_id"))
      .withWatermark("click_ts", "10 minutes")
    val joined = vs.join(cs, expr(
      """user_id = c_user_id AND
        |click_ts >= view_ts AND
        |click_ts <= view_ts + interval 30 minutes""".stripMargin))
      .select(col("view_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      vMem.addData(views)
      cMem.addData(clicks)
      q.processAllAvailable()
      val streamed = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      val bv = views.toDF().select(col("event_id").as("view_id"),
        col("ts").as("view_ts"), col("user_id"))
      val bc = clicks.toDF().select(col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("user_id").as("c_user_id"))
      val batch = bv.join(bc, expr(
        """user_id = c_user_id AND
          |click_ts >= view_ts AND
          |click_ts <= view_ts + interval 30 minutes""".stripMargin))
        .select(col("view_id"), col("click_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

      assert(streamed.nonEmpty, "the interval join must produce matches on this data")
      assert(streamed == batch, "stream-stream join must equal the batch join")
    } finally q.stop()
  }
}
