package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream capability queries over the `events` table:
  * tumbling-window aggregation, gaps-and-islands sessionization, and
  * JSON-ish property extraction. The same transformations run unchanged
  * under Structured Streaming (see `graft.streaming.EventStream`) — here
  * they're expressed in batch so DuckDB can oracle-check them.
  *
  * Determinism: all session logic runs on exact integer epoch-microseconds
  * (`unix_micros` / DuckDB `epoch_us`), never float timestamps; window keys
  * are formatted strings (parquet ns-vs-us timestamp types differ between
  * engines, strings don't).
  */
object EventQueries {

  /** events.parquet's physical timestamp encoding varies by generator round
    * (ns or us) — [[EventTs]] normalizes either to exact integer
    * epoch-micros. The legacy ns flag and the UTC zone pin are set on a
    * [[Scoped]] fork, never the caller's session. */
  private def ev(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = fork.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_us", EventTs.tsUs(raw))
  }

  /** Tumbling 1-hour window per event type: count + value sum.
    * Streaming twin: `groupBy(window($"ts", "1 hour"), $"event_type")`. */
  def hourly(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        date_format(date_trunc("hour", timestamp_micros(col("ts_us"))), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  /** Sessionization: per-user sessions split on >30-minute inactivity gaps
    * (gaps-and-islands via lag + running sum). Streaming twin:
    * `session_window($"ts", "30 minutes")` / flatMapGroupsWithState. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) > 1800L * 1000000L, 1)
          .when(lag(col("ts_us"), 1).over(byUser).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(col("ts_us")) - min(col("ts_us"))) / lit(1000000L)).cast("long").as("duration_s"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Sessionization through Spark's NATIVE `session_window` aggregate —
    * the built-in operator beside [[sessionize]]'s gaps-and-islands
    * rewrite (use the built-in where one exists; the rewrite remains for
    * engines/dialects without it). Semantics differ at EXACTLY the gap:
    * session_window's per-event interval is half-open [t, t+gap), so a
    * successor at precisely t+gap starts a NEW session, where the
    * gaps-and-islands form's `diff > gap` keeps it — the oracle splits
    * on `>=` accordingly, and the hash gate pins the boundary contract
    * rather than papering over it. Emits (start, last-event, count,
    * value sum) per session; `end − gap` recovers the last event time
    * exactly (fixed-gap sessions). */
  def sessionWindowNative(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        (unix_micros(col("sw.end")) - lit(1800000000L)).as("last_us"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes: each event lands in exactly 4
    * windows (slide divides width). Streaming twin:
    * `window($"ts", "1 hour", "15 minutes")`. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(
        window(timestamp_micros(col("ts_us")), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** JSON-ish property extraction (regexp — engine-portable) + histogram. */
  def propsHistogram(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"))

  /** Real JSON-path extraction (get_json_object, not the regexp fallback of
    * [[propsHistogram]]): per event type, stats over the JSON `k` property.
    * Exact integers → no rounding discipline. */
  def jsonExtract(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Cohort retention: users grouped by first-active day, counted by how
    * many distinct days later they return — the product-analytics classic.
    * Two aggs + a broadcast-sized cohort join; all integer date math. */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir).select(col("user_id"),
      date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** [[retention]] recomputed through BITMAP-INDEX aggregation — the
    * roaring-bitmap shape every interactive-analytics engine uses for
    * distinct-user counting: users become bits in fixed 32-bit words
    * (block = id div 32, bit = id mod 32), per-group distinctness is
    * `bit_or` of the words, the count is Σ bit_count. Same output as
    * [[retention]] — the oracle is SHARED VERBATIM (two algorithms, one
    * answer) — but where count(DISTINCT user) carries the full id set as
    * partial-aggregate state through the shuffle, the bitmap's partial is
    * one word per touched block: map-side `bit_or` combines losslessly,
    * shuffle volume is bounded by blocks (= users/32), and the merge is a
    * single OR instruction. The production win is intersection reuse —
    * the same words answer any cohort×day set operation without
    * re-touching rows. Exact (a bit per user), never approximate. */
  def retentionBitmap(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir).select(col("user_id"),
      date_format(timestamp_micros(col("ts_us")), "yyyy-MM-dd").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        expr("user_id div 32").as("block"),
        expr("shiftleft(1L, cast(user_id % 32 as int))").as("w"))
      .groupBy(col("cohort_day"), col("day_offset"), col("block"))
      .agg(expr("bit_or(w)").as("word"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(sum(expr("bit_count(word)")).cast("long").as("n_users"))
  }

  /** EXACT streaming distinct-user counts — [[retentionBitmap]]'s bitmap
    * words as STREAMING STATE, the third leg of the streaming-distinct
    * story (kmv_distinct_stream_win is the approximate sketch,
    * events_dedup_stream keeps per-id state): daily active users from a
    * 1-day event-time window grouped by (window, user-block), per-group
    * state ONE 32-bit word folded by `bit_or` (idempotent, so at-least-once
    * redelivery cannot overcount — the same fold-contract class as the
    * bloom sink), watermark-evicted in event time. Exactness costs
    * users/32 words per live day instead of the sketch's k longs — the
    * honest tradeoff the two entries pin from both sides. Input is 3-day
    * ordered staged slices (~11 micro-batches; session-cached layout) plus
    * a sentinel slice 2 days past the horizon so every REAL day finalizes
    * under append mode while the sentinel's own window never emits.
    * Oracle: the plain batch count(DISTINCT) per day. */
  def dauStreamBitmap(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    val root = StreamScratch.fresh("daubitmap")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    val inDir = StreamScratch.stageOrderedShared(s"dau_3d_sent:$dir") {
      val raw = fork.read.parquet(s"$dir/events.parquet")
      val evDf = raw.withColumn("ts_us", EventTs.tsUs(raw))
        .withColumn("slice", expr("ts_us DIV 259200000000"))
        .select(col("user_id"), col("ts_us"), col("slice"))
      val slices = evDf.select(col("slice")).distinct().orderBy(col("slice"))
        .collect().map(_.getLong(0)) // span/3-days-sized
      val maxUs = evDf.agg(max(col("ts_us"))).head.getLong(0)
      val sentinel = fork.range(1).select(lit(-1L).as("user_id"),
        lit(maxUs + 2L * 86400L * 1000000L).as("ts_us"), lit(-1L).as("slice"))
      slices.toSeq.map(sl =>
        evDf.where(col("slice") === sl).select(col("user_id"), col("ts_us"))) :+
        sentinel.select(col("user_id"), col("ts_us"))
    }
    // state is (live days × user-blocks) words — tiny; size stores to the
    // staged micro-batch volume (scale-adaptive, r16)
    StreamScratch.sizeStateStoresAdaptive(fork, inDir)
    val stream = fork.readStream.schema("user_id LONG, ts_us LONG")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val q = stream
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"),
        expr("user_id div 32").as("block"))
      .agg(expr("bit_or(shiftleft(1L, cast(pmod(user_id, 32) as int)))").as("word"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("word"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.schema("day STRING, word LONG").parquet(outDir)
      .groupBy(col("day"))
      .agg(sum(expr("bit_count(word)")).cast("long").as("dau"))
  }

  /** The 7-day attribution lookback, in epoch-micros. */
  private val AttribWindowUs = 7L * 86400L * 1000000L

  /** [[attribution]]'s STREAMING TWIN
    * ([[graft.streaming.EventStream.attributionStream]]): the same exact
    * integer-cents first/last/linear attribution computed incrementally —
    * per-user state is only the horizon-live touch list, purchases
    * attribute and emit immediately (no pending obligations, so no flush
    * sentinel is needed for completeness), state prunes on every arrival
    * and whole users evict by event-time timeout. Input is the 3-day
    * ordered slice staging (~11 micro-batches, session-cached layout);
    * the drained sink re-aggregated per channel shares the batch entry's
    * oracle VERBATIM. */
  def attributionStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    val root = StreamScratch.fresh("attrib")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    val inDir = StreamScratch.stageOrderedShared(s"attrib_3d:$dir") {
      val raw = fork.read.parquet(s"$dir/events.parquet")
      val evDf = raw.withColumn("ts_us", EventTs.tsUs(raw))
        .where(col("event_type").isin("view", "click", "purchase"))
        .select(col("event_id"), col("ts_us"), col("user_id"), col("event_type"),
          expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"),
          expr("ts_us DIV 259200000000").as("slice"))
      val slices = evDf.select(col("slice")).distinct().orderBy(col("slice"))
        .collect().map(_.getLong(0)) // span/3-days-sized
      slices.toSeq.map(sl => evDf.where(col("slice") === sl)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("cents")))
    }
    // state is horizon-live touches per user — size stores to the staged
    // micro-batch volume (scale-adaptive, r16)
    StreamScratch.sizeStateStoresAdaptive(fork, inDir)
    val stream = fork.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG, event_type STRING, cents LONG")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("cents"))
      .as[graft.streaming.EventStream.AttEvent]
    val q = graft.streaming.EventStream
      .attributionStream(stream, AttribWindowUs).toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.schema("channel STRING, f LONG, l LONG, lin LONG").parquet(outDir)
      .groupBy(col("channel"))
      .agg(sum(col("f")).as("first_cents"), sum(col("l")).as("last_cents"),
        sum(col("lin")).as("linear_cents"))
  }

  /** MULTI-TOUCH ATTRIBUTION — the marketing-analytics readout beside
    * [[funnel]]: every purchase's value is credited to the user's
    * preceding 'view'/'click' touches within a 7-day lookback under the
    * three standard models at once (first-touch, last-touch, linear), and
    * to a synthetic 'direct' channel when no touch precedes it.
    *
    * JOINLESS on the Spark side: each purchase row reads its own touch
    * statistics (count, first/last touch, per-channel counts) from ONE
    * value-based RANGE frame over the user's timeline
    * (`rangeBetween(-7d, -1 µs)` on exact integer ts_us — strictly-earlier
    * is the frame's upper bound, not a join predicate), so the whole entry
    * is one per-user window sort plus one channel-sized aggregate. The
    * oracle spells the same semantics as the purchase×touch interval join
    * it would be naively — two algorithms, one exact answer. Per-user
    * event volume is bounded by construction (the generator scales USER
    * cardinality), so the window partitions stay flat at any corpus size.
    *
    * Money is exact integer cents (the [[MlQueries.mlAbTest]] cast
    * discipline); the linear split is integer division with the remainder
    * credited to the LAST touch's channel, so the three models all sum to
    * exactly the purchase total and every figure hash-gates bit-for-bit.
    * Channel-cardinality output (≤3 rows) at any scale. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val isTouch = col("event_type").isin("view", "click")
    val frame = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-AttribWindowUs, -1L)
    val touchStruct = when(isTouch,
      struct(col("ts_us"), col("event_id"), col("event_type")))
    val scored = ev(s, dir)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("cents"))
      // all four window aggregates in ONE projection so they share a single
      // Window node (one pass per partition); count, not sum-of-indicators:
      // an EMPTY frame must yield 0, and a window sum over no rows is NULL
      .select(col("*"),
        count(when(col("event_type") === "view", lit(1))).over(frame).as("n_view"),
        count(when(col("event_type") === "click", lit(1))).over(frame).as("n_click"),
        min(touchStruct).over(frame).as("first_t"),
        max(touchStruct).over(frame).as("last_t"))
      .where(col("event_type") === "purchase")
      .withColumn("n", col("n_view") + col("n_click"))
    // per-purchase contribution triples (first, last, linear) per channel —
    // mirrors the oracle's UNION ALL contribution rows exactly: a channel
    // row exists iff the purchase has ≥1 touch on it (or is 'direct')
    val contrib = scored.select(explode(
      when(col("n") === 0,
        array(struct(lit("direct").as("channel"), col("cents").as("f"),
          col("cents").as("l"), col("cents").as("lin"))))
      .otherwise(filter(array(
        struct(col("first_t.event_type").as("channel"), col("cents").as("f"),
          lit(0L).as("l"), lit(0L).as("lin")),
        struct(col("last_t.event_type").as("channel"), lit(0L).as("f"),
          col("cents").as("l"), lit(0L).as("lin")),
        struct(lit("view").as("channel"), lit(0L).as("f"), lit(0L).as("l"),
          (expr("cents div n") * col("n_view") +
            when(col("last_t.event_type") === "view",
              col("cents") - expr("cents div n") * col("n")).otherwise(0L)).as("lin")),
        struct(lit("click").as("channel"), lit(0L).as("f"), lit(0L).as("l"),
          (expr("cents div n") * col("n_click") +
            when(col("last_t.event_type") === "click",
              col("cents") - expr("cents div n") * col("n")).otherwise(0L)).as("lin"))),
        c => // linear rows only for channels the purchase actually touched
          c.getField("f") > 0 || c.getField("l") > 0 ||
          when(c.getField("channel") === "view", col("n_view") > 0)
            .otherwise(col("n_click") > 0)))).as("c"))
    contrib.groupBy(col("c.channel").as("channel"))
      .agg(sum(col("c.f")).as("first_cents"),
        sum(col("c.l")).as("last_cents"),
        sum(col("c.lin")).as("linear_cents"))
  }

  /** Event funnel: per user, first 'view' followed by a later 'purchase'. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_type"), col("ts_us"))
    val firstView = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("first_view_us"))
    val purchases = e.where(col("event_type") === "purchase")
    firstView.join(purchases, "user_id")
      .where(col("ts_us") > col("first_view_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases_after_view"))
  }

  /** CEP sequence pattern — the MATCH_RECOGNIZE shape ([[funnel]] is the
    * unordered first-touch version; this is the ORDERED one with a time
    * bound and a negative condition): a `view` matched by the NEXT
    * `purchase` of the same user within 30 minutes, with no `error`
    * strictly between them. One pass, no self-join: each user's timeline
    * is scanned once in reverse (ts desc), and two conditional running
    * mins over the strictly-later frame carry "earliest later purchase"
    * and "earliest later error" to every row — the classic
    * next-matching-event rewrite that replaces a per-view probe join
    * (quadratic in dense streams) with ONE window sort, partition-
    * parallel across users at any scale. The frame is ROWS-bounded on a
    * total order (ts_us, event_id), so both engines walk identical
    * frames; match condition and tie policy (an error AT the purchase's
    * timestamp does not veto) are pure integer comparisons. */
  def pattern(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"), col("event_type"),
      col("ts_us"), col("event_id"))
    val later = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Long.MinValue, -1)
    e.withColumn("next_purchase_us",
        min(when(col("event_type") === "purchase", col("ts_us"))).over(later))
      .withColumn("next_error_us",
        min(when(col("event_type") === "error", col("ts_us"))).over(later))
      .where(col("event_type") === "view" &&
        col("next_purchase_us") - col("ts_us") <= lit(30L * 60 * 1000000) &&
        (col("next_error_us").isNull ||
          col("next_error_us") >= col("next_purchase_us")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("ts_us")).as("first_view_us"),
        max(col("ts_us")).as("last_view_us"))
  }

  /** LINEAR INTERPOLATION onto a 15-minute grid — the other resample
    * policy beside [[resample]]'s forward-fill (ffill serves state-like
    * signals, interpolation serves continuous measurements): for each
    * user's consecutive event pair, every grid point in (t0, t1] gets
    * the time-weighted value. The interpolation is EXACT integer
    * arithmetic spelled divergence-proof: cents and microseconds are
    * integers, and the weighted form (v0·(t1−g) + v1·(g−t0)) DIV (t1−t0)
    * keeps the numerator NONNEGATIVE so Spark's truncating DIV and
    * DuckDB's flooring `//` cannot disagree (the subtraction spelling
    * v0 + (v1−v0)·α would go negative on falling signals and the two
    * engines' integer divisions round opposite ways). One lead() window
    * per user + an in-scan grid explode — no join, partition-parallel. */
  def interpolate(s: SparkSession, dir: String): DataFrame = {
    val stepUs = 15L * 60 * 1000000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        expr("cast(cast(value as decimal(18,2)) * 100 as bigint)").as("v"))
      .withColumn("t1", lead(col("ts_us"), 1).over(w))
      .withColumn("v1", lead(col("v"), 1).over(w))
      .where(col("t1").isNotNull)
      .withColumn("k0", expr(s"ts_us DIV $stepUs + 1"))
      .withColumn("k1", expr(s"t1 DIV $stepUs"))
      .where(col("k1") >= col("k0")) // Spark sequence() would DESCEND
      .select(col("user_id"), col("ts_us"), col("t1"), col("v"), col("v1"),
        explode(expr("sequence(k0, k1)")).as("k"))
      .select(col("user_id"), expr(s"k * $stepUs").as("grid_us"),
        expr(s"(v * (t1 - k * $stepUs) + v1 * (k * $stepUs - ts_us)) DIV (t1 - ts_us)")
          .as("v_interp_e2"))
  }

  /** DAU/WAU STICKINESS — the product-metric classic (weekly grain: the
    * synthetic corpus spans one calendar month, so weeks give the report
    * real cardinality where months collapse to a single row): per
    * epoch-week, the weekly-active-user count, the day-summed DAU mass,
    * and the stickiness ratio avg-DAU/WAU as an exact ppm integer
    * (Σdau·10⁶ DIV (days·wau) — the avg and the ratio fold into one
    * integer division so no float crosses the gate). Two exact distinct
    * aggregates (user-day, user-week) + one rollup; week-cardinality
    * output at any corpus size. */
  def dauMau(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).select(col("user_id"),
      expr("ts_us DIV 86400000000").as("day"),
      expr("ts_us DIV 604800000000").as("week"))
    val dau = e.select(col("week"), col("day"), col("user_id")).distinct()
      .groupBy(col("week"), col("day")).agg(count(lit(1)).as("dau"))
    val wau = e.select(col("week"), col("user_id")).distinct()
      .groupBy(col("week")).agg(count(lit(1)).as("wau"))
    dau.groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      .join(wau, "week")
      .select(col("week"), col("n_days"), col("sum_dau"), col("wau"),
        expr("(1000000 * sum_dau) DIV (n_days * wau)").as("stickiness_ppm"))
  }

  /** TOP BEHAVIORAL PATHS — the sequence-mining companion to [[markov]]'s
    * one-step model: the 20 most common 3-event paths across all user
    * timelines (what do people actually DO, in order?), via two lead()
    * columns on the same (ts_us, event_id) total order and one count —
    * sequence n-grams as a window pass, no self-joins, global top-k on a
    * total order (count desc, then the three steps). */
  def pathTopk(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type").as("step1"))
      .withColumn("step2", lead(col("step1"), 1).over(w))
      .withColumn("step3", lead(col("step1"), 2).over(w))
      .where(col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20)
  }

  /** First-order MARKOV TRANSITION MATRIX over per-user event sequences —
    * the behavioral-model estimation pass (what follows a view? how
    * absorbing is an error?): one lag() per user timeline on the
    * (ts_us, event_id) total order, transition counts per (prev, next)
    * pair, and row-normalized probabilities as exact floor-e6 integers
    * (count·10⁶ DIV row total — no float division crosses the gate).
    * Output is |types|² rows at ANY corpus size; the estimation is one
    * window pass + one partial-combining count. */
  def markov(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    ev(s, dir)
      .select(col("user_id"), col("event_id"), col("ts_us"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("event_type"), col("n"),
        expr("(1000000 * n) DIV n_from").as("p_e6"))
  }

  /** Rolling z-score anomaly detection — the metrics-monitoring classic:
    * an event is anomalous when its value sits more than 3 trailing
    * standard deviations from the mean of the SAME user's previous 20
    * events (at least 10 required — cold windows don't alarm). The whole
    * test runs in EXACT integer arithmetic: values are exact cents
    * (decimal-cast, not double-truncated), the trailing mean/variance
    * stay as raw (n, Σx, Σx²) window sums, and 3σ is the integer
    * inequality (x·n − Σx)² > 9·(n·Σx² − (Σx)²) — no float division or
    * sqrt anywhere, so both engines agree to the bit. One window sort per
    * user partition, ROWS-bounded frame ⇒ O(1) state per row; at 100 TB
    * this is a single partition-parallel pass, and the same three running
    * sums are exactly what a streaming form would carry. */
  def anomaly(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(-20, -1)
    ev(s, dir)
      .withColumn("x", expr("cast(cast(value as decimal(18,2)) * 100 as bigint)"))
      .withColumn("n", count(col("x")).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("ss", sum(expr("x * x")).over(w))
      .where(col("n") >= 10 &&
        (col("x") * col("n") - col("s")) * (col("x") * col("n") - col("s")) >
          lit(9L) * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("x").as("value_e2"), col("n").as("n_window"))
  }

  /** STREAMING CEP — [[pattern]]'s incremental twin
    * ([[graft.streaming.EventStream.patternStream]]): per-user pending
    * views decided wholesale at each purchase (the pattern's next-purchase
    * structure makes the state one purchase-to-purchase gap deep), error
    * vetoes carried per view, horizon pruning + event-time timeout
    * retiring users who never purchase. Staging is event-time-ordered
    * year slices (names+mtimes pinned, one file per micro-batch) so the
    * watermark advances monotonically across batches and no staged row is
    * late; within a batch the operator sorts by (ts_us, event_id) — the
    * batch twin's frame order — so the drained match set aggregates to
    * the SAME rows and the oracle is shared verbatim. CepStreamSpec pins
    * the state lifecycle (purchase flush, error veto, timeout eviction to
    * zero state rows). */
  def patternStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    val root = StreamScratch.fresh("cep")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    // immutable staged slices cached per session (checkpoint/sink per-run)
    val inDir = StreamScratch.stageOrderedShared(s"cep_3d:$dir") {
      val raw = fork.read.parquet(s"$dir/events.parquet")
      val evDf = raw.withColumn("ts_us", EventTs.tsUs(raw))
        .withColumn("slice", expr("ts_us DIV 259200000000")) // 3-day slices
      val slices = evDf.select(col("slice")).distinct().orderBy(col("slice"))
        .collect().map(_.getLong(0)) // span/3-days-sized
      slices.toSeq.map(sl =>
        evDf.where(col("slice") === sl)
          .select(col("event_id"), col("ts_us"), col("user_id"),
            col("event_type"), col("value")))
    }
    // state-store count sizes to per-batch volume (one keyed state store
    // per shuffle partition, snapshotted every micro-batch), derived from
    // the staged slice bytes — scales back up with real volume (r16)
    StreamScratch.sizeStateStoresAdaptive(fork, inDir)
    val stream = fork.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[graft.streaming.EventStream.Event]
    val q = graft.streaming.EventStream
      .patternStream(stream, windowUs = 30L * 60 * 1000000).toDF()
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.parquet(outDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(col("view_us")).as("first_view_us"),
        max(col("view_us")).as("last_view_us"))
  }

  /** STREAM-STREAM interval join UNDER THE GATE (StreamStreamJoinSpec
    * proves the semantics on MemoryStreams; this entry runs the real
    * two-file-stream shape and hash-gates the drained pairs): views and
    * clicks flow as two independent watermarked streams, joined per user
    * with the click bounded to [view, view+30min] — the attribution-join
    * shape. The event-time bound plus both watermarks is what lets Spark
    * SIZE AND EVICT the join state (a view is dropped once the combined
    * watermark passes its match window — state is horizon-bounded, the
    * production-viability condition for stream-stream joins); ordered
    * year-slice staging keeps every row on-time on its own stream, so
    * the inner join's append output over all batches equals the batch
    * interval join and the oracle is plain SQL. */
  def joinStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    val root = StreamScratch.fresh("ssjoin")
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    // staged slices are immutable functions of (table, 3-day width, side):
    // built once per session, reused by every later invocation — 22
    // coalesce(1) writes leave the per-run hot path (checkpoint + sink
    // stay fresh under `root`, so the stream itself replays in full)
    val staged = StreamScratch.stageOrderedSharedMulti(s"ssjoin_3d:$dir") {
      val raw = fork.read.parquet(s"$dir/events.parquet")
      val evDf = raw.withColumn("ts_us", EventTs.tsUs(raw))
        .withColumn("slice", expr("ts_us DIV 259200000000")) // 3-day slices
      val slices = evDf.select(col("slice")).distinct().orderBy(col("slice"))
        .collect().map(_.getLong(0)) // span/3-days-sized
      Seq("view", "click").map(et => et -> slices.toSeq.map(sl =>
        evDf.where(col("slice") === sl && col("event_type") === et)
          .select(col("event_id"), col("ts_us"), col("user_id"))))
    }
    val (inV, inC) = (s"$staged/view", s"$staged/click")
    // state-store count sizes to PER-BATCH volume, not the session default:
    // a stream-stream join keeps 4 state stores per shuffle partition per
    // side, each committing a delta file every micro-batch — pure fixed
    // overhead at KB-sized slices (r16 A/B: 11.7 s at 4 partitions → 9.3 s
    // at 1; summed state-commit time 12.3 s → 1.65 s). Derived from the
    // staged slice bytes, so production per-batch volume scales it back up.
    StreamScratch.sizeStateStoresAdaptive(fork, inV, inC)
    def side(inDir: String): DataFrame = fork.readStream
      .schema("event_id LONG, ts_us LONG, user_id LONG")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    val vs = side(inV)
      .withColumn("view_ts", timestamp_micros(col("ts_us")))
      .withWatermark("view_ts", "10 minutes")
      .select(col("event_id").as("view_id"), col("view_ts"), col("user_id"))
    val cs = side(inC)
      .withColumn("click_ts", timestamp_micros(col("ts_us")))
      .withWatermark("click_ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("click_ts"),
        col("user_id").as("c_user_id"))
    val q = vs.join(cs, expr(
        """user_id = c_user_id AND
          |click_ts >= view_ts AND
          |click_ts <= view_ts + interval 30 minutes""".stripMargin))
      .select(col("user_id"), col("view_id"), col("click_id"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.parquet(outDir)
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Point-in-interval range join through the binning rewrite
    * ([[graft.operators.RangeJoin]]): event values land in overlapping value
    * bands (21 literal ranges, [5k, 5k+12)) via a bin equi-join instead of
    * the nested-loop theta join Spark would otherwise plan. */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = (0 to 20).map(k => (k.toLong, k * 5.0, k * 5.0 + 12.0))
      .toDF("band_id", "lo", "hi")
    graft.operators.RangeJoin.pointInRange(
        ev(s, dir).select(col("value")), col("value"),
        bands, col("lo"), col("hi"), binWidth = 12.0)
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
  }

  /** 15-minute resample per user: dense bucket grid from each user's first
    * to last event, zero-filled event counts, forward-filled last event
    * type ([[graft.operators.Resample]]). */
  def resample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.resample(ev(s, dir),
        col("user_id"), col("ts_us"), col("event_type"),
        intervalUs = 15L * 60 * 1000000)
      .select(col("k").as("user_id"), col("bucket"), col("n"), col("state"))

  // ---- shared streaming-sink harness --------------------------------------
  // One definition of the oracle-gated streaming mechanics (r5 review: five
  // entries had copy-pasted it, so a watermark/sentinel/checkpoint fix had
  // five places to drift): parquet → `readStream` → `transform` →
  // `Trigger.AvailableNow` → parquet sink, sink read back for the hash
  // compare. A far-future sentinel (when requested) advances the watermark
  // so the post-data micro-batch (SPARK-24156 no-data batch) flushes every
  // open state; the sentinel's own state never finalizes (its horizon stays
  // beyond the final watermark) — typed transforms filter `user_id >= 0`
  // defensively. All input files load in ONE micro-batch (no
  // maxFilesPerTrigger). Work dirs are FIXED per entry and cleared UP FRONT:
  // bench reps must not accumulate corpus copies in /tmp, and a leftover
  // checkpoint would make a rerun resume into an empty sink.

  private def clearDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }

  private def streamedSink(fork: SparkSession, dir: String, name: String,
                           addSentinel: Boolean,
                           mutateInput: DataFrame => DataFrame = identity)
                          (transform: DataFrame => DataFrame): DataFrame = {
    fork.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fork.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = fork.read.parquet(s"$dir/events.parquet")
    val src = raw
      .select(col("event_id"), EventTs.tsTimestamp(raw).as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // built lazily: the sentinel's max-ts collect only runs when the shared
    // staged input below is first written, not on every invocation
    def input =
      if (!addSentinel) mutateInput(src)
      else {
        val maxTsUs = src.agg(max(unix_micros(col("ts")))).head.getLong(0)
        val sentinel = fork.range(1).select(
          lit(-1L).as("event_id"),
          timestamp_micros(lit(maxTsUs + 86400L * 1000000)).as("ts"),
          lit(-1L).as("user_id"), lit("view").as("event_type"), lit(0.0).as("value"))
        mutateInput(src).union(sentinel)
      }
    // PID-keyed so concurrent JVMs (e.g. a test run next to a Verify run)
    // get disjoint sink/checkpoint dirs — a shared fixed path lets one
    // process clearDir a checkpoint the other's stream is mid-flight on.
    // Within one JVM invocations are sequential, so reuse + clearDir keeps
    // tmp bounded instead of accumulating a dir per invocation.
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_stream_${name}_${ProcessHandle.current().pid()}")
    clearDir(root)
    val (outDir, ckpt) = (s"$root/out", s"$root/ckpt")
    // the staged INPUT is a deterministic, immutable function of (entry,
    // table): the same artifact class as the ordered slice stagings — one
    // session writes it once, every later invocation (bench reps, repeated
    // gates) streams the SAME files (r16 optimization round; the write was
    // ~0.7 s per invocation × 7 entries × reps). Checkpoint and sink stay
    // per-run fresh above, so each run still consumes every staged file.
    val inDir = graft.operators.Artifacts.sharedPath(
      s"stage:events_sink_$name:$dir") { p => input.write.parquet(p) }
    // single-batch source (no maxFilesPerTrigger): one micro-batch reads the
    // whole staged input, so state stores size to the SUM of staged bytes —
    // scale-adaptive like the slice-staged siblings (r16 verdict ask #4)
    StreamScratch.sizeStateStoresAdaptiveTotal(fork, inDir)
    val stream = fork.readStream.schema(src.schema).parquet(inDir)
    val q = transform(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    fork.read.parquet(outDir)
  }

  /** The STREAMING resample path directly under the DuckDB oracle (VERDICT
    * r4 ask #2): [[graft.streaming.EventStream.resampleStream]]
    * (flatMapGroupsWithState) through [[streamedSink]]; hash-compared
    * against the SAME oracle SQL as `events_resample` — the streaming
    * output itself hash-matches DuckDB, not just a spec-equality hop
    * through the batch twin. */
  def resampleStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    streamedSink(fork, dir, "resample", addSentinel = true) { df =>
      graft.streaming.EventStream.resampleStream(
          df.as[graft.streaming.EventStream.Event],
          intervalUs = 15L * 60 * 1000000)
        .filter(_.user_id >= 0).toDF()
    }.select(col("user_id"), col("bucket"), col("n"), col("state"))
  }

  /** The STREAMING sessionize path under the oracle:
    * [[graft.streaming.EventStream.sessionize]] (flatMapGroupsWithState,
    * per-user session ordinals) through [[streamedSink]]; same oracle SQL
    * as `events_sessionize`. */
  def sessionizeStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    streamedSink(fork, dir, "sessionize", addSentinel = true) { df =>
      graft.streaming.EventStream.sessionize(
          df.as[graft.streaming.EventStream.Event])
        .filter(_.user_id >= 0).toDF()
    }.select(col("user_id"), col("session_id"),
      col("n_events").cast("long").as("n_events"), col("duration_s"),
      round(col("sum_value"), 4).as("sum_value"))
  }

  /** STREAMING exactly-once ingestion dedup under the oracle: the events
    * flow is polluted with replayed rows (every event_id ≡ 0 mod 7 appears
    * twice — an at-least-once source's redelivery), streamed through
    * [[graft.streaming.EventStream.dedupEvents]]
    * (`dropDuplicatesWithinWatermark` on event_id); the sink must equal the
    * CLEAN events table exactly. Replays are identical rows, so survivor
    * choice is immaterial; state is bounded by the watermark horizon (the
    * production property — an unbounded `distinct` would never age out). */
  def dedupStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    streamedSink(fork, dir, "dedup", addSentinel = false,
        mutateInput = src => src.union(src.where(col("event_id") % 7 === 0))) {
      graft.streaming.EventStream.dedupEvents
    }.select(col("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("user_id"), col("event_type"),
      col("value"))
  }

  /** The WINDOWED-AGGREGATION streaming shape under the oracle (the third
    * stateful form next to flatMapGroupsWithState and stream-dedup):
    * `readStream` → watermark → tumbling-window groupBy → APPEND-mode
    * parquet sink — append emits a window only once the watermark passes
    * its end, so the sink holds exactly the finalized windows. The sentinel
    * advances the watermark past every data window; its own window ends
    * beyond the final watermark and is never emitted. Same oracle as
    * `events_hourly`. */
  def hourlyStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    streamedSink(fork, dir, "hourly", addSentinel = true)(
        graft.streaming.EventStream.hourly)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
  }

  /** OVERLAPPING-window streaming sink under the oracle — same harness as
    * [[hourlyStreamed]] but each event contributes to 4 sliding windows;
    * append mode emits a window only once the watermark passes its END, and
    * the sentinel is a day out, so every data window finalizes while the
    * sentinel's own 4 windows never do. */
  def slidingStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    streamedSink(fork, dir, "sliding", addSentinel = true)(
        graft.streaming.EventStream.sliding)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), round(col("sum_value"), 4).as("sum_value"))
  }

  /** STREAM-STATIC join sink under the oracle: the stream enriched with a
    * broadcast user→tier dimension (derived deterministically from the
    * corpus' distinct users), hourly counts per tier. The sentinel's user
    * is absent from the dimension, so it advances the watermark but drops
    * out of the inner join — no filter needed. */
  def hourlyTierStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    streamedSink(fork, dir, "tier", addSentinel = true) { df =>
      val tiers = fork.read.parquet(s"$dir/events.parquet")
        .select(col("user_id")).distinct()
        .withColumn("tier", pmod(col("user_id"), lit(4)).cast("int"))
      graft.streaming.EventStream.hourlyByTier(df, tiers)
    }.select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("tier"), col("n"), round(col("sum_value"), 4).as("sum_value"))
  }

  /** Streaming FUNNEL sink under the oracle: per-user first-view →
    * later-purchase counts through [[graft.streaming.EventStream.funnelStream]]
    * (flatMapGroupsWithState, monotone counting + pending pre-view
    * purchases), drained by the sentinel's watermark advance; same oracle
    * SQL as the batch `events_funnel`. */
  def funnelStreamed(s: SparkSession, dir: String): DataFrame = Scoped(s) { fork =>
    import fork.implicits._
    streamedSink(fork, dir, "funnel", addSentinel = true) { df =>
      graft.streaming.EventStream.funnelStream(
          df.as[graft.streaming.EventStream.Event])
        .filter(_.user_id >= 0).toDF()
    }.select(col("user_id"), col("n_purchases_after_view"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_resample" -> resample _,
    "events_resample_stream" -> resampleStreamed _,
    "events_tier_stream" -> hourlyTierStreamed _,
    "events_funnel_stream" -> funnelStreamed _,
    "events_sessionize_stream" -> sessionizeStreamed _,
    "events_dedup_stream" -> dedupStreamed _,
    "events_hourly_stream" -> hourlyStreamed _,
    "events_sliding_stream" -> slidingStreamed _,
    "events_json_extract" -> jsonExtract _,
    "events_hourly" -> hourly _,
    "events_sliding" -> sliding _,
    "events_sessionize" -> sessionize _,
    "events_session_window" -> sessionWindowNative _,
    "events_props_histogram" -> propsHistogram _,
    "events_funnel" -> funnel _,
    "events_pattern" -> pattern _,
    "events_pattern_stream" -> patternStreamed _,
    "events_anomaly" -> anomaly _,
    "events_markov" -> markov _,
    "events_path_topk" -> pathTopk _,
    "events_dau_mau" -> dauMau _,
    "events_interpolate" -> interpolate _,
    "events_join_stream" -> joinStreamed _,
    "events_retention" -> retention _,
    "events_retention_bitmap" -> retentionBitmap _,
    "events_dau_stream" -> dauStreamBitmap _,
    "events_range_join" -> rangeJoin _,
    "events_attribution" -> attribution _,
    "events_attribution_stream" -> attributionStreamed _,
  )

  // same exact-integer bucket math as Resample (floor division == `//`);
  // bucket's last event via row_number (ts DESC, state DESC == Spark's
  // max(struct(ts, state))), forward fill via last_value IGNORE NULLS over
  // the same running frame. Shared verbatim by the batch entry and the
  // streaming-sink entry — the stream's whole contract is equality.
  private val resampleOracleSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 900000000 AS bucket,
      |         epoch_us(ts) AS ts_us, event_type AS state
      |  FROM events),
      |b AS (SELECT user_id, min(bucket) AS lob, max(bucket) AS hib
      |      FROM e GROUP BY 1),
      |grid AS (SELECT user_id, unnest(range(lob, hib + 1)) AS bucket FROM b),
      |pb AS (SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      |ls AS (SELECT user_id, bucket, state FROM (
      |  SELECT user_id, bucket, state,
      |    row_number() OVER (PARTITION BY user_id, bucket
      |                       ORDER BY ts_us DESC, state DESC) AS rn FROM e)
      |  WHERE rn = 1),
      |g AS (SELECT grid.user_id, CAST(grid.bucket AS BIGINT) AS bucket,
      |        coalesce(pb.n, 0) AS n, ls.state
      |      FROM grid LEFT JOIN pb ON grid.user_id = pb.user_id AND grid.bucket = pb.bucket
      |      LEFT JOIN ls ON grid.user_id = ls.user_id AND grid.bucket = ls.bucket)
      |SELECT user_id, bucket, CAST(n AS BIGINT) AS n,
      |  last_value(state IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS state
      |FROM g""".stripMargin

  /** Shared by `events_pattern` and its streaming twin: the reverse-scan
    * conditional-window-min rewrite on the (ts_us, event_id) total order. */
  private val patternOracle =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
      |  FROM events),
      |seq AS (SELECT *,
      |  min(CASE WHEN event_type = 'purchase' THEN ts_us END) OVER
      |    (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_purchase_us,
      |  min(CASE WHEN event_type = 'error' THEN ts_us END) OVER
      |    (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_error_us
      |  FROM e)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_matches,
      |  min(ts_us) AS first_view_us, max(ts_us) AS last_view_us
      |FROM seq
      |WHERE event_type = 'view'
      |  AND next_purchase_us - ts_us <= 30 * 60 * 1000000
      |  AND (next_error_us IS NULL OR next_error_us >= next_purchase_us)
      |GROUP BY 1""".stripMargin

  /** Shared by `events_retention` and its bitmap-aggregation twin. */
  private val retentionOracle =
    """WITH days AS (
      |  SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |  FROM events),
      |cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY 1)
      |SELECT cohort_day,
      |  CAST(date_diff('day', CAST(cohort_day AS DATE), CAST(day AS DATE)) AS INT)
      |    AS day_offset,
      |  CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
      |FROM days d JOIN cohort USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  /** Shared by `events_attribution` and its incremental streaming twin:
    * the naive purchase×touch interval join with per-touch linear shares
    * (remainder to the last touch), first/last on the (ts_us, event_id)
    * total order, 'direct' for untouched purchases — exact integer cents. */
  private val attributionOracle =
    """WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS ts_us,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id AS tid,
      |    event_type AS channel
      |  FROM events WHERE event_type IN ('view', 'click')),
      |pt AS (SELECT p.pid, p.cents, t.channel, t.ts_us, t.tid
      |  FROM p JOIN t ON p.user_id = t.user_id
      |   AND t.ts_us < p.ts_us AND t.ts_us >= p.ts_us - 604800000000),
      |rk AS (SELECT pid, cents, channel,
      |    row_number() OVER (PARTITION BY pid ORDER BY ts_us, tid) AS rn_a,
      |    row_number() OVER (PARTITION BY pid ORDER BY ts_us DESC, tid DESC) AS rn_d,
      |    count(*) OVER (PARTITION BY pid) AS n
      |  FROM pt),
      |contrib AS (
      |  SELECT channel, cents AS f, 0 AS l, 0 AS lin FROM rk WHERE rn_a = 1
      |  UNION ALL SELECT channel, 0, cents, 0 FROM rk WHERE rn_d = 1
      |  UNION ALL SELECT channel, 0, 0,
      |    cents // n + CASE WHEN rn_d = 1 THEN cents - (cents // n) * n ELSE 0 END
      |  FROM rk
      |  UNION ALL SELECT 'direct', cents, cents, cents
      |  FROM p WHERE pid NOT IN (SELECT pid FROM pt))
      |SELECT channel, CAST(sum(f) AS BIGINT) AS first_cents,
      |  CAST(sum(l) AS BIGINT) AS last_cents,
      |  CAST(sum(lin) AS BIGINT) AS linear_cents
      |FROM contrib GROUP BY 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "events_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        | max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "events_resample" -> resampleOracleSql,
    // the streaming sink must equal the batch grid EXACTLY — same oracle
    "events_resample_stream" -> resampleOracleSql,
    // replay-polluted stream deduped back to exactly the clean table
    "events_dedup_stream" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events""".stripMargin,
    "events_range_join" -> {
      val bands = (0 to 20)
        .map(k => s"($k, ${k * 5.0}::DOUBLE, ${k * 5.0 + 12.0}::DOUBLE)").mkString(", ")
      s"""WITH bands(band_id, lo, hi) AS (VALUES $bands)
         |SELECT CAST(band_id AS BIGINT) AS band_id,
         | CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
         |FROM events JOIN bands ON value >= lo AND value < hi
         |GROUP BY 1""".stripMargin
    },
    "events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the finalized-window sink must equal the batch aggregation exactly
    "events_hourly_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // stream-static enrichment: the tier dimension is a pure function of
    // user_id, so the oracle computes it inline over the batch table
    "events_tier_stream" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | CAST(user_id % 4 AS INT) AS tier, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sliding_stream" ->
      """WITH e AS (
        |  SELECT event_type, value, epoch_us(ts) AS tu, unnest(range(0, 4)) AS i
        |  FROM events)
        |SELECT strftime(make_timestamp((tu // 900000000 - i) * 900000000),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM e GROUP BY 1, 2""".stripMargin,
    "events_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value, epoch_us(ts) AS tu, unnest(range(0, 4)) AS i
        |  FROM events)
        |SELECT strftime(make_timestamp((tu // 900000000 - i) * 900000000),
        |         '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, CAST(count(*) AS BIGINT) AS n,
        | round(sum(value), 4) AS sum_value
        |FROM e GROUP BY 1, 2""".stripMargin,
    "events_props_histogram" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS k_mod,
        | CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin,
    // the purchase×touch interval join the Spark side's RANGE frame
    // replaces: per-touch linear shares (remainder to the last touch),
    // first/last by the same (ts_us, event_id) total order, 'direct' for
    // untouched purchases — all exact integer cents
    "events_attribution" -> attributionOracle,
    // the incremental state machine drains to exactly the batch frame's
    // attribution, so the oracle is shared verbatim
    "events_attribution_stream" -> attributionOracle,
    "events_retention" -> retentionOracle,
    // the bitmap-word spelling must be indistinguishable from
    // count(DISTINCT) — shared verbatim (two algorithms, one answer)
    "events_retention_bitmap" -> retentionOracle,
    // the streamed bitmap state must drain to exactly the batch distinct
    "events_dau_stream" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |FROM events GROUP BY 1""".stripMargin,
    "events_funnel" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_view_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_purchases_after_view
        |FROM events e JOIN fv ON e.user_id = fv.user_id
        |WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.first_view_us
        |GROUP BY 1""".stripMargin,
    // the identical reverse-scan window rewrite: ROWS frames on the same
    // (ts_us, event_id) total order walk the same rows in both engines
    "events_pattern" -> patternOracle,
    // the streamed state machine drains to exactly the batch rewrite's
    // match set, so the oracle is shared verbatim
    "events_pattern_stream" -> patternOracle,
    // exact distinct user-day/user-week sets; stickiness by one integer
    // division
    "events_dau_mau" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    epoch_us(ts) // 604800000000 AS week
        |  FROM events),
        |dau AS (SELECT week, day, CAST(count(*) AS BIGINT) AS dau FROM
        |  (SELECT DISTINCT week, day, user_id FROM e) GROUP BY 1, 2),
        |wau AS (SELECT week, CAST(count(*) AS BIGINT) AS wau FROM
        |  (SELECT DISTINCT week, user_id FROM e) GROUP BY 1),
        |d AS (SELECT week, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM dau GROUP BY 1)
        |SELECT week, n_days, sum_dau, wau,
        |  (1000000 * sum_dau) // (n_days * wau) AS stickiness_ppm
        |FROM d JOIN wau USING (week)""".stripMargin,
    // identical double-lead pairing; top-20 on the same total order
    "events_path_topk" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    event_type AS step1
        |  FROM events),
        |p AS (SELECT step1, lead(step1) OVER w AS step2,
        |    lead(step1, 2) OVER w AS step3
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin,
    // identical lag pairing on the same total order; probabilities as
    // exact floor-e6 integers
    "events_markov" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |p AS (SELECT event_type, lag(event_type) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
        |  FROM e),
        |c AS (SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |  AS n_from FROM c)
        |SELECT prev_type, event_type, n, (1000000 * n) // n_from AS p_e6
        |FROM t""".stripMargin,
    // gaps-and-islands with the HALF-OPEN split (diff >= gap starts a new
    // session) — session_window's boundary semantics, pinned exactly
    "events_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu, value
        |  FROM events),
        |f AS (SELECT *, CASE WHEN lag(tu) OVER w IS NULL THEN 1
        |    WHEN tu - lag(tu) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
        |n AS (SELECT user_id, tu, value, sum(brk) OVER
        |  (PARTITION BY user_id ORDER BY tu, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id, min(tu) AS start_us, max(tu) AS last_us,
        |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 4) AS sum_value
        |FROM n GROUP BY user_id, sid""".stripMargin,
    // identical lead pairing, identical nonnegative-numerator integer
    // interpolation (floor == trunc there), identical grid arithmetic
    "events_interpolate" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events),
        |p AS (SELECT user_id, ts_us, v,
        |  lead(ts_us) OVER w AS t1, lead(v) OVER w AS v1
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |g AS (SELECT user_id, ts_us, t1, v, v1,
        |  unnest(range(ts_us // 900000000 + 1, t1 // 900000000 + 1)) AS k
        |  FROM p WHERE t1 IS NOT NULL AND t1 // 900000000 >= ts_us // 900000000 + 1)
        |SELECT user_id, k * 900000000 AS grid_us,
        |  (v * (t1 - k * 900000000) + v1 * (k * 900000000 - ts_us))
        |    // (t1 - ts_us) AS v_interp_e2
        |FROM g""".stripMargin,
    // the batch interval join the two-stream append output must equal
    "events_join_stream" ->
      """WITH v AS (SELECT event_id AS view_id, epoch_us(ts) AS vt, user_id
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, epoch_us(ts) AS ct, user_id
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id, view_id, click_id
        |FROM v JOIN c ON v.user_id = c.user_id
        |  AND ct >= vt AND ct <= vt + 30 * 60 * 1000000""".stripMargin,
    // identical trailing ROWS frame; the 3-sigma test is a pure bigint
    // inequality so no float can cross the gate
    "events_anomaly" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events),
        |s AS (SELECT *,
        |  count(x) OVER w AS n, sum(x) OVER w AS s, sum(x * x) OVER w AS ss
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, ts_us, x AS value_e2,
        |  CAST(n AS BIGINT) AS n_window
        |FROM s
        |WHERE n >= 10
        |  AND (x * n - s) * (x * n - s) > 9 * (n * ss - s * s)""".stripMargin,
    // the streaming funnel drains to exactly the batch join's rows
    "events_funnel_stream" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS first_view_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1)
        |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_purchases_after_view
        |FROM events e JOIN fv ON e.user_id = fv.user_id
        |WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.first_view_us
        |GROUP BY 1""".stripMargin,
  ) ++ sessionizeOracles

  // the streaming sink must equal the batch gaps-and-islands EXACTLY,
  // session ordinals included — same oracle for both entries
  private lazy val sessionizeOracles = Map(
    "events_sessionize" -> sessionizeOracleSql,
    "events_sessionize_stream" -> sessionizeOracleSql)

  // lazy: initialized on demand from oracleSql's own initializer above
  private lazy val sessionizeOracleSql = ("" +
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |numbered AS (
        |  SELECT user_id, ts_us, value,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM flagged)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_s,
        |  round(sum(value), 4) AS sum_value
        |FROM numbered GROUP BY 1, 2""".stripMargin)
}
