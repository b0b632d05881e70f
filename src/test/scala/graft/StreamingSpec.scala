package graft

import graft.queries.MultimodalQueries
import graft.streaming.{Doc, DocStreams, Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, size, split, sum}
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Timestamped text page for the trending-terms scenarios (top-level so
  * Spark can derive its encoder). */
final case class Page(doc_id: Long, ts: Timestamp, text: String)

/** Page with a source attribution, for the per-source drift monitors. */
final case class SPage(doc_id: Long, ts: Timestamp, source: String, text: String)

/** Structured Streaming semantics driven through MemoryStream — the
  * beyond-parity surface (the reference has no streaming, SURVEY §2.9). */
class StreamingSpec extends GraftSuite {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates per tumbling window under a watermark") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0),
      Event(3, ts("2024-01-01 01:10:00"), 2, "view", 5.0),
      // watermark pusher: far-future event finalizes earlier windows
      Event(4, ts("2024-01-01 09:00:00"), 2, "view", 1.0))
    val q = EventStreams.windowedCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM wc ORDER BY window_start").collect()
      // windows 00:00 and 01:00 are past the watermark (09:00 - 30min)
      assert(rows.length == 2, rows.mkString(";"))
      assert(rows(0).getAs[Long]("n_events") == 2)       // two clicks in 00:00
      assert(rows(0).getAs[Double]("total_value") == 3.0)
      assert(rows(1).getAs[Long]("n_events") == 1)       // one view in 01:00
    } finally q.stop()
  }

  test("windowedCounts: identical code runs in batch over the events table") {
    val batch = EventStreams.windowedCounts(
      Tables.df(spark, sf, "events"), "1 hour", "30 minutes")
    assert(batch.count() > 0)
  }

  test("streaming result equals batch result on the same finalized windows") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val events = Seq(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.5),
      Event(2, ts("2024-01-01 00:40:00"), 2, "click", 2.5),
      Event(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0),
      Event(4, ts("2024-01-01 02:10:00"), 2, "view", 4.0),
      Event(5, ts("2024-01-01 23:00:00"), 1, "click", 0.5)) // watermark pusher
    val in = MemoryStream[Event]
    in.addData(events: _*)
    val q = EventStreams.windowedCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("wc_eq").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM wc_eq ORDER BY window_start, event_type").collect()
      val batch = EventStreams.windowedCounts(events.toDF(), "1 hour", "30 minutes")
        .filter($"window_start" < ts("2024-01-01 22:30:00")) // watermark-finalized only
        .orderBy("window_start", "event_type").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
        s"streamed=${streamed.mkString(";")} batch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("slidingCounts: hopping windows finalize under the watermark, stream equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val events = Seq(
      Event(1, ts("2024-01-01 00:05:00"), 1, "click", 1.5),
      Event(2, ts("2024-01-01 00:40:00"), 2, "click", 2.5),
      Event(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0),
      Event(4, ts("2024-01-01 23:00:00"), 1, "click", 0.5)) // watermark pusher
    val in = MemoryStream[Event]
    in.addData(events: _*)
    val q = EventStreams.slidingCounts(in.toDF(), "2 hours", "30 minutes", "30 minutes")
      .writeStream.format("memory").queryName("sc_eq").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM sc_eq ORDER BY window_start, event_type").collect()
      // every event must appear in exactly windowLen/slide = 4 windows
      val mass = streamed.map(_.getAs[Long]("n_events")).sum +
        4 /* pusher's un-finalized windows */
      assert(mass == events.length * 4L, s"window mass: $mass")
      // identical code in batch, restricted to watermark-finalized windows
      val batch = EventStreams.slidingCounts(events.toDF(), "2 hours", "30 minutes")
        .filter($"window_end" <= ts("2024-01-01 22:30:00"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
        s"streamed=${streamed.mkString(";")} batch=${batch.mkString(";")}")
      // and the batch catalog twin agrees on total window mass at sf
      val cat = SparkEntry.queries("q_events_hopping")(spark, sf)
        .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
      val nEvents = Tables.df(spark, sf, "events").count()
      assert(cat == nEvents * 4, s"catalog hopping mass $cat vs ${nEvents * 4}")
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with preceding clicks") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(
      Event(1, ts("2024-01-01 10:00:00"), 7, "click", 0.0),
      Event(2, ts("2024-01-01 10:30:00"), 7, "click", 0.0),
      Event(3, ts("2024-01-01 08:00:00"), 7, "click", 0.0), // >1h before: no pair
      Event(4, ts("2024-01-01 10:40:00"), 9, "click", 0.0)) // other user
    purchases.addData(Event(10, ts("2024-01-01 10:45:00"), 7, "purchase", 99.0))
    val q = EventStreams.purchasesWithRecentClicks(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssj").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id FROM ssj ORDER BY click_id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(1L, 2L), rows.mkString(","))
    } finally q.stop()
  }

  test("as-of enrichment: late click within the watermark wins; idle purchases flush by timeout") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("asof").outputMode(OutputMode.Append())
      .start()
    try {
      // b1: user 7 clicks then purchases; user 5 purchases with no click
      in.addData(
        Event(101, ts("2024-01-01 10:00:00"), 7, "click", 0.0),
        Event(102, ts("2024-01-01 10:30:00"), 7, "purchase", 10.0),
        Event(501, ts("2024-01-01 10:15:00"), 5, "purchase", 5.0))
      q.processAllAvailable() // watermark still 0: everything buffered
      // b2: a later purchase for user 7, plus a click before it
      in.addData(
        Event(103, ts("2024-01-01 12:00:00"), 7, "purchase", 20.0),
        Event(104, ts("2024-01-01 11:45:00"), 7, "click", 0.0))
      q.processAllAvailable() // wm=10:00: still nothing finalized
      // b3: the LATE click — arrives a batch after 11:45's, with an
      // earlier-than-last-seen ts, but still ahead of the watermark, so
      // it must win the as-of for purchase 103. The user-9 click drags
      // the watermark forward.
      in.addData(
        Event(105, ts("2024-01-01 11:50:00"), 7, "click", 0.0),
        Event(901, ts("2024-01-01 13:30:00"), 9, "click", 0.0))
      q.processAllAvailable() // wm=11:30: purchases 102 and 501 finalize
      // b4: nothing more for users 7 or 5 — purchase 103 must flush via
      // the event-time timeout alone once the watermark passes it
      in.addData(Event(902, ts("2024-01-01 14:30:00"), 9, "click", 0.0))
      q.processAllAvailable() // wm=13:00 > 12:00
      val rows = spark.sql(
        """SELECT user_id, purchase_id, purchase_ts, last_click_ts, ms_since_click
          |FROM asof ORDER BY purchase_id""".stripMargin).collect()
      assert(rows.map(_.getLong(1)).toSeq == Seq(102L, 103L, 501L), rows.mkString(";"))
      val byId = rows.map(r => r.getLong(1) -> r).toMap
      assert(byId(102L).getTimestamp(3) == ts("2024-01-01 10:00:00"), byId(102L).toString)
      assert(byId(102L).getLong(4) == 30L * 60 * 1000, byId(102L).toString)
      assert(byId(103L).getTimestamp(3) == ts("2024-01-01 11:50:00"), byId(103L).toString)
      assert(byId(103L).getLong(4) == 10L * 60 * 1000, byId(103L).toString)
      assert(byId(501L).isNullAt(3) && byId(501L).isNullAt(4), byId(501L).toString)
      // state is O(users), not O(events): once the watermark has passed
      // everything, a user holds at most one carried-click row — user 7
      // (latest click) and user 9 (immature pusher clicks) remain, user 5
      // (nothing left to carry) was removed
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 2, s"expected 2 state rows, got $stateRows")
    } finally q.stop()
  }

  test("streaming as-of replay equals the batch as-of join over the events corpus") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val evs = Tables.df(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS(), "30 minutes")
      .writeStream.format("memory").queryName("asof_corpus")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(evs: _*) // one replay batch: wm=0, nothing dropped late
      q.processAllAvailable()
      // two watermark pushers: after the second, the watermark is past
      // every real purchase, so every group flushes (via timeout — the
      // pusher user shares no groups with the corpus)
      val maxTs = evs.map(_.ts.getTime).max
      in.addData(Event(-1, new Timestamp(maxTs + 3600 * 1000), -1, "click", 0.0))
      q.processAllAvailable()
      in.addData(Event(-2, new Timestamp(maxTs + 7200 * 1000), -1, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT user_id, purchase_id,
          |  date_format(purchase_ts, 'yyyy-MM-dd HH:mm:ss') AS purchase_ts,
          |  date_format(last_click_ts, 'yyyy-MM-dd HH:mm:ss') AS last_click_ts,
          |  ms_since_click
          |FROM asof_corpus ORDER BY user_id, purchase_id""".stripMargin).collect()
      val batch = SparkEntry.queries("q_join_asof")(spark, sf).collect()
      assert(streamed.length == batch.length,
        s"streamed=${streamed.length} batch=${batch.length}")
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("live dau sketch: stream equals the batch expression and sits within 10% of exact") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct, window}
    val evDf = Tables.df(spark, sf, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val evs = evDf.as[Event].collect().toSeq
    val in = MemoryStream[Event]
    val q = EventStreams.dauSketch(in.toDS().toDF())
      .writeStream.format("memory").queryName("dau_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(evs: _*); q.processAllAvailable()
      val maxTs = evs.map(_.ts.getTime).max
      // pusher two days out finalizes every real day window
      in.addData(Event(-1, new Timestamp(maxTs + 2L * 86400 * 1000), -1, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM dau_sink ORDER BY day_start").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      // the alerting flag is derived from the emitted estimate itself
      assert(spark.sql("SELECT dau_est, heavy FROM dau_sink").collect()
        .forall(r => r.getBoolean(1) == (r.getLong(0) > 1000L)),
        "heavy must equal dau_est > heavyThreshold")
      // batch twin: the IDENTICAL expression over the static frame
      // (sketch estimates are deterministic), finalized days only
      val batch = EventStreams.dauSketch(evDf).orderBy("day_start").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
      assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq,
        s"stream=${streamed.mkString(";")} batch=${batch.mkString(";")}")
      // and each finalized day's estimate sits within 10% of exact
      val exact = evDf.groupBy(window(col("ts"), "1 day"))
        .agg(countDistinct(col("user_id")).as("dau"))
        .select(col("window.start"), col("dau")).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      streamed.foreach { case (day, est) =>
        val ex = exact(day)
        assert(math.abs(est - ex) <= 0.1 * ex, s"day=$day est=$est exact=$ex")
      }
    } finally q.stop()
  }

  test("stream-static enrichment joins a streaming fact to a dim table") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:00:00"), 0, "click", 1.0),
      Event(2, ts("2024-01-01 00:01:00"), 1, "view", 2.0))
    val dim = Seq((0L, "gold"), (1L, "silver")).toDF("user_id", "tier")
    val q = EventStreams.enrich(in.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val tiers = spark.sql("SELECT event_id, tier FROM enr ORDER BY event_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
      assert(tiers == Seq(1L -> "gold", 2L -> "silver"), tiers.mkString(","))
    } finally q.stop()
  }

  test("foreachBatch idempotent sink: replaying a batch does not duplicate rows") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val in = MemoryStream[Event]
    in.addData(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0))
    val q = EventStreams.sinkParquetIdempotent(in.toDF(), dir).start()
    try {
      q.processAllAvailable()
      in.addData(Event(2, ts("2024-01-01 00:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 2)
      // simulate a replayed batch: rewrite batch 0's directory by hand —
      // the overwrite semantics keep the row count stable
      Seq(Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0)).toDF()
        .write.mode("overwrite").parquet(s"$dir/batch_id=0")
      assert(spark.read.parquet(dir).count() == 2)
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    in.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 00:00:01"), 1, "click", 1.0), // dup id
      Event(2, ts("2024-01-01 00:05:00"), 2, "view", 2.0))
    val q = EventStreams.dedupe(in.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dd").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      in.addData(Event(2, ts("2024-01-01 00:06:00"), 2, "view", 2.0)) // dup in later batch
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dd ORDER BY event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(1L, 2L), ids.mkString(","))
    } finally q.stop()
  }

  test("streaming anomaly monitor: frozen-baseline replay equals batch; flags fire") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val ev = Tables.df(spark, sf, "events")
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value")
    // lambda shape: freeze the baseline from the first 20 days (its last
    // 7 fully-observed days), then score the live tail against it
    val cutoff = ts("2024-01-21 00:00:00")
    val baseline = EventStreams.anomalyBaseline(ev.filter($"ts" < cutoff))
    assert(baseline.count() == 5, "every event type has 7 observed days")
    val live = ev.filter($"ts" >= cutoff).collect().map(r =>
      Event(r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val in = MemoryStream[Event]
    in.addData(live.sortBy(_.ts.getTime): _*)
    val q = EventStreams.anomalies(in.toDF(), baseline, "1 hour")
      .writeStream.format("memory").queryName("anom").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM anom ORDER BY day, event_type")
        .collect()
      // identical code in batch, restricted to watermark-finalized days
      // (a day finalizes once the watermark passes its end)
      val maxTs = live.map(_.ts.getTime).max
      val wmMs = maxTs - 3600L * 1000
      val batch = EventStreams.anomalies(live.toSeq.toDF(), baseline, "1 hour")
        .filter($"day".cast("long") * 1000L + 86400000L <= wmMs)
        .orderBy("day", "event_type").collect()
      assert(streamed.length == batch.length && streamed.nonEmpty,
        s"${streamed.length} streamed vs ${batch.length} batch")
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      // the corpus must exercise both branches of the alarm
      val flags = streamed.map(_.getAs[Boolean]("is_anomaly"))
      assert(flags.contains(true) && flags.contains(false))
    } finally q.stop()
  }

  test("streaming CUSUM monitor: replay equals batch cusumDaily; drift fires") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    // drifted fixture, the cusumDaily spec's twin: 30 days per type,
    // "up" steps 10 -> 15 events/day at day 21, "dn" steps 10 -> 5
    var id = 0L
    def day(i: Int) = ts(f"2024-02-${0 + i}%02d 12:00:00") // days 1..28
    val fixture = for {
      typ <- Seq("up", "dn")
      i <- 1 to 28
      n = if (i <= 20) 10 else if (typ == "up") 15 else 5
      _ <- 1 to n
    } yield { id += 1; Event(id, day(i), 1, typ, 1.0) }
    val in = MemoryStream[Event]
    in.addData(fixture: _*)
    val q = EventStreams.cusumMonitor(in.toDS(), "1 hour")
      .writeStream.format("memory").queryName("cusum")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // sentinel batch: one far-future event per type advances the
      // watermark past every fixture day and re-invokes both groups
      in.addData(
        Event(id + 1, ts("2024-03-30 00:00:00"), 1, "up", 1.0),
        Event(id + 2, ts("2024-03-30 00:00:00"), 1, "dn", 1.0))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM cusum ORDER BY event_type, d").collect()
      // the batch query's own core over the same daily counts
      val dc = fixture.toDF()
        .selectExpr("event_type",
          "unix_millis(CAST(ts AS TIMESTAMP)) div 86400000 AS d")
        .groupBy("event_type", "d")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      val batch = graft.queries.PipelineQueries.cusumDaily(dc)
        .orderBy("event_type", "d").collect()
      assert(streamed.length == batch.length && streamed.nonEmpty,
        s"${streamed.length} streamed vs ${batch.length} batch")
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      // drift must actually fire, in the right direction per type
      val byType = streamed.groupBy(_.getString(0))
      assert(byType("up").exists(_.getBoolean(5)), "up drift never fired")
      assert(byType("dn").exists(_.getBoolean(6)), "dn drift never fired")
      assert(!byType("up").exists(_.getBoolean(6)), "spurious dn alarm on up")
      assert(!byType("dn").exists(_.getBoolean(5)), "spurious up alarm on dn")
    } finally q.stop()
  }

  test("file-source streaming: new files in a directory flow through the pipeline") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    def writeBatch(name: String, events: Seq[Event]): Unit = {
      val tmp = java.nio.file.Files.createTempFile("graft_batch", ".json")
      val lines = events.map(e =>
        s"""{"event_id":${e.event_id},"ts":"${e.ts}","user_id":${e.user_id},"event_type":"${e.event_type}","value":${e.value}}""")
      java.nio.file.Files.write(tmp, String.join("\n", lines: _*).getBytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, name)) // atomic arrival
    }
    writeBatch("b0.json", Seq(
      Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0)))
    val stream = s.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .json(dir)
    val q = EventStreams.windowedCounts(stream, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("filewc").outputMode(OutputMode.Append())
      .start()
    try {
      q.processAllAvailable()
      // second file arrives later and pushes the watermark past hour 0
      writeBatch("b1.json", Seq(Event(3, ts("2024-01-01 09:00:00"), 2, "view", 5.0)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM filewc ORDER BY window_start").collect()
      assert(rows.length == 1, rows.mkString(";"))
      assert(rows.head.getAs[Long]("n_events") == 2)
      assert(rows.head.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("sessionize event-time timeout closes idle sessions as the watermark passes") {
    // Replay-correct idle flushing: the session closes because event
    // time moved past last+gap (via other users' events pushing the
    // watermark), never because of wall clock — rerunning the same data
    // gives the same sessions.
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(
        in.toDS().withWatermark("ts", "0 seconds"),
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())
      .writeStream.format("memory").queryName("sess_et").outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM sess_et").count() == 0) // still open
      // another USER's far-future event advances the watermark past
      // 00:30 (user 7's last + gap)...
      in.addData(Event(2, ts("2024-01-01 02:00:00"), 9, "view", 2.0))
      q.processAllAvailable()
      // ...and the timeout fires in the following micro-batch
      in.addData(Event(3, ts("2024-01-01 02:00:01"), 9, "view", 2.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess_et WHERE user_id = 7").collect()
      assert(rows.length == 1, rows.mkString(";"))
      assert(rows.head.getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("soak: 100 micro-batches on RocksDB state store keep session state bounded") {
    // Long-running stateful streams live or die by two things this test
    // pins: (a) the state store can be RocksDB (off-heap, incremental
    // checkpoints — the provider a 1000-executor deployment runs), and
    // (b) state is actually RETIRED as sessions close, so 100+
    // micro-batches don't accrete 100 batches' worth of state.
    import scala.jdk.CollectionConverters._
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS()).writeStream
      .format("memory").queryName("soak").outputMode(OutputMode.Append())
      .start()
    try {
      val t0 = ts("2024-01-01 00:00:00").getTime
      val users = 4
      (0 until 100).foreach { i =>
        // one event per micro-batch; user (i % 4)'s previous event is
        // 160 min older, so each arrival closes that user's prior
        // session — open state can never exceed `users` entries
        in.addData(Event(i.toLong,
          new Timestamp(t0 + i.toLong * 40 * 60 * 1000), (i % users).toLong, "click", 1.0))
        q.processAllAvailable()
      }
      val op = q.lastProgress.stateOperators(0)
      assert(op.numRowsTotal <= users, s"state rows grew to ${op.numRowsTotal}")
      // prove the RocksDB provider is the one actually serving state
      assert(op.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in ${op.customMetrics.keySet}")
      val closed = spark.sql("SELECT count(*) FROM soak").head().getLong(0)
      assert(closed == 100 - users, s"closed=$closed")
    } finally {
      q.stop()
      prev match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }

  test("soak: 100 micro-batches of as-of enrichment on RocksDB retire state") {
    // same two pins as the sessionize soak, for the as-of operator: the
    // state store can be RocksDB, and state retires — each user carries
    // ONE mature click plus only watermark-incomplete buffers, so 100
    // batches leave at most `users` state rows, not 100 batches' worth.
    import scala.jdk.CollectionConverters._
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[Event]
    val q = EventStreams.asofEnrich(in.toDS(), "30 minutes").writeStream
      .format("memory").queryName("asof_soak").outputMode(OutputMode.Append())
      .start()
    try {
      val t0 = ts("2024-01-01 00:00:00").getTime
      // batch pairs per user: click at batch 2k, that user's purchase 40
      // min later at batch 2k+1 — every purchase matches its click at
      // exactly 40 min, users rotate so state must retire across them
      (0 until 100).foreach { i =>
        val user = (i % 8) / 2
        val typ = if (i % 2 == 0) "click" else "purchase"
        in.addData(Event(i.toLong,
          new Timestamp(t0 + i.toLong * 40 * 60 * 1000), user.toLong, typ, 1.0))
        q.processAllAvailable()
      }
      val op = q.lastProgress.stateOperators(0)
      assert(op.numRowsTotal <= 4, s"state rows grew to ${op.numRowsTotal}")
      assert(op.customMetrics.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in ${op.customMetrics.keySet}")
      // purchases land at odd batches; one finalizes once the watermark
      // (trailing 40min+30min behind) passes it — all but the last
      val rows = spark.sql(
        "SELECT ms_since_click FROM asof_soak").collect()
      assert(rows.length == 49, s"emitted=${rows.length}")
      assert(rows.forall(_.getLong(0) == 40L * 60 * 1000),
        rows.map(_.toString).mkString(","))
    } finally {
      q.stop()
      prev match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }

  test("sessionize closes a session after a 30-minute gap") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val in = MemoryStream[Event]
    val q = EventStreams.sessionize(in.toDS()).writeStream
      .format("memory").queryName("sess").outputMode(OutputMode.Append())
      .start()
    try {
      in.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0))
      q.processAllAvailable()
      // gap > 30 min within one batch: first session closes, second opens
      in.addData(Event(3, ts("2024-01-01 01:00:00"), 7, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sess").collect()
      assert(rows.length == 1, rows.mkString(";"))
      val s0 = rows.head
      assert(s0.getAs[Long]("user_id") == 7)
      assert(s0.getAs[Long]("n_events") == 2)
      assert(s0.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("DocStreams.signals (row-local fold) equals the batch explode-count catalog queries") {
    // the sorted-run-length fold must produce the SAME signals as
    // q_text_quality (quality) + q_text_repetition (top-gram counts,
    // repetitive flag) computed via explode + two-phase counts
    val got = DocStreams.signals(Tables.df(spark, sf, "documents")).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getInt(3), r.getInt(4), r.getBoolean(5)))).toMap
    val quality = SparkEntry.queries("q_text_quality")(spark, sf)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rep = SparkEntry.queries("q_text_repetition")(spark, sf)
      .select("doc_id", "top_word_n", "top_bigram_n", "repetitive").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(got.size == quality.size)
    got.foreach { case (id, (q, tw, tb, rf)) =>
      assert(q == quality(id), s"quality doc $id")
      assert((tw, tb, rf) == rep(id), s"repetition doc $id")
    }
  }

  test("DocStreams run-length fold equals naive recounts on 300 random adversarial docs") {
    // seeded-random texts over a 4-token alphabet (maximal tie/run
    // density — the hard case for a run-length fold), incl. empty-ish
    // and single-token docs
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = Vector("aa", "bb", "cc", "dd")
    val docs = (1 to 300).map { i =>
      val n = rnd.nextInt(12) + 1
      val text = Seq.fill(n)(alpha(rnd.nextInt(alpha.size))).mkString(" ")
      (i.toLong, text, "xx", "srcT", text.length.toLong)
    }
    val df = docs.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.streaming.DocStreams.signals(df).collect()
      .map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
    docs.foreach { case (id, text, _, _, _) =>
      val w = text.split(" ", -1)
      val topW = w.groupBy(identity).values.map(_.length).max
      val bgs = w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val topB = if (bgs.isEmpty) 0 else bgs.groupBy(identity).values.map(_.length).max
      assert(got(id) == ((topW, topB)), s"doc $id: '$text'")
    }
  }

  test("file-source ingest: dir-watched docs flow through curation into a parquet sink") {
    // the full ingest path a corpus pipeline runs: files land in a
    // directory, each micro-batch is curated (quality + repetition
    // filters) and APPENDED to a parquet sink under a checkpoint — then
    // the sink must equal the batch curation of everything that arrived
    val inDir = java.nio.file.Files.createTempDirectory("graft_docs_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_docs_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_docs_ckpt").toString
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val all = docs.collect()
    def writeWave(name: String, rows: Seq[org.apache.spark.sql.Row]): Unit = {
      val s = spark
      import scala.jdk.CollectionConverters._
      val tmp = java.nio.file.Files.createTempDirectory("graft_wave")
      s.createDataFrame(rows.asJava, docs.schema).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(inDir, name))
    }
    val (w1, w2) = all.splitAt(all.length / 2)
    writeWave("w1.parquet", w1.toSeq)
    val stream = spark.readStream.schema(docs.schema).parquet(inDir)
    val q = DocStreams.curate(stream)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      writeWave("w2.parquet", w2.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read.parquet(outDir).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val batch = DocStreams.curate(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(sunk == batch)
    assert(sunk.nonEmpty && sunk.size < all.length)
  }

  test("restart recovery: a stopped query resumes from its checkpoint with state intact") {
    // The fault-tolerance claim behind every checkpointed pipeline: kill
    // the query MID-WINDOW, start a NEW query over the same checkpoint +
    // sink, and the half-built window's counts must survive the restart —
    // offsets, state store, and sink commits all recover, no window is
    // emitted twice and none is lost. The wave boundary cuts INSIDE hour
    // 1 so its aggregate state is genuinely restored, not recomputed.
    val s = spark
    import s.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("graft_rst_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_rst_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rst_ckpt").toString
    val base = 1700000000000L - (1700000000000L % 3600000L) // hour-aligned
    def ev(id: Long, ms: Long, tp: String) =
      (id, new Timestamp(ms), id % 97, tp, 1.0)
    val all = (0 until 180).flatMap { m => // 3 hours, one event/minute/type
      Seq(ev(2L * m, base + m * 60000L, "click"),
        ev(2L * m + 1, base + m * 60000L, "view"))
    }
    val pusher = Seq(ev(9999L, base + 12L * 3600000L, "click"))
    val schema = all.toDF("event_id", "ts", "user_id", "event_type", "value").schema
    def writeWave(name: String, rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_rst_wave")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(inDir, name))
    }
    def startQuery() = EventStreams.windowedCounts(
        spark.readStream.schema(schema).parquet(inDir))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()
    // wave 1 ends at minute 100 — 40 minutes INTO hour 1
    writeWave("w1.parquet", all.filter(_._2.getTime < base + 100L * 60000L))
    val q1 = startQuery()
    try { q1.processAllAvailable() } finally q1.stop()
    // the stream is DOWN; the rest of the data lands, then a new query
    // resumes from the same checkpoint
    writeWave("w2.parquet",
      all.filter(_._2.getTime >= base + 100L * 60000L) ++ pusher)
    val q2 = startQuery()
    try { q2.processAllAvailable() } finally q2.stop()
    val sunk = spark.read.parquet(outDir)
      .select("window_start", "event_type", "n_events").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    // every real hour finalizes with exactly 60 events per type — hour 1
    // (split by the restart) included; no duplicates, nothing lost
    val want = (0 until 3).flatMap(h =>
      Seq((base + h * 3600000L, "click", 60L), (base + h * 3600000L, "view", 60L)))
      .sortBy(t => (t._1, t._2))
    assert(sunk.toSeq == want, sunk.mkString(";"))
  }

  test("ingest boilerplate stripping (frozen model) equals the batch catalog query") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val docs = Tables.df(spark, sf, "documents")
    // train once in batch (the q_text_boilerplate rule), freeze, stream
    val model = DocStreams.boilerplateModel(docs)
    assert(model.nonEmpty, "gate corpus must contain boilerplate segments")
    val all = docs.select("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect()
    val in = MemoryStream[Doc]
    val q = DocStreams.stripBoilerplate(in.toDF(), model)
      .writeStream.format("memory").queryName("boiler")
      .outputMode(OutputMode.Append()).start()
    try {
      val (w1, w2) = all.splitAt(all.length / 2)
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(w2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.sql("SELECT * FROM boiler").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val batch = SparkEntry.queries("q_text_boilerplate")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(sunk == batch)
    assert(sunk.values.exists(_._2 > 0), "stream must strip something")
  }

  test("boilerplate model cap engages on a many-templates corpus, keeping highest-df keys") {
    val s = spark
    import s.implicits._
    // 40 templates with distinct document frequencies df = 2+t; each doc
    // is exactly one 8-word segment, so segment key = (source, hash(text))
    val docs = (for {
      t <- 0 until 40
      c <- 0 until (2 + t)
    } yield (t.toLong * 1000 + c, "srcA", s"tpl$t w1 w2 w3 w4 w5 w6 end$t"))
      .toDF("doc_id", "source", "text")
    val full = DocStreams.boilerplateModel(docs)
    assert(full.size == 40, s"uncapped model must hold all templates, got ${full.size}")
    val capped = DocStreams.boilerplateModel(docs, maxKeys = 10)
    assert(capped.size == 10)
    // the cap must keep the top-10 by (df DESC, key) — templates 30..39
    val expected = docs.groupBy("source", "text")
      .agg(org.apache.spark.sql.functions.countDistinct("doc_id").as("df"))
      .selectExpr("concat_ws('|', source, cast(xxhash64(text) as string)) AS k", "df")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (k, df) => (-df, k) }.take(10).map(_._1).sorted.toSeq
    assert(capped == expected)
    // monotonicity: the capped model still strips what it kept — a doc of
    // the highest-df template reads 100% boilerplate, a dropped-template
    // doc reads 0% (under-strip, never corruption)
    val flagged = DocStreams.stripBoilerplate(docs, capped)
      .select("doc_id", "n_boiler").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged(39000L) == 1L, "kept template must strip")
    assert(flagged(0L) == 0L, "dropped template must pass through unstripped")
  }

  test("trending terms: watermarked token counts finalize once; top-k equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    // timestamped pages; window 1 h, watermark 30 min
    val pages = Seq(
      Page(1, ts("2024-01-01 00:05:00"), "spark spark scan join"),
      Page(2, ts("2024-01-01 00:40:00"), "spark scan scan table"),
      Page(3, ts("2024-01-01 01:10:00"), "join join join spark"),
      Page(4, ts("2024-01-01 09:00:00"), "late watermark pusher"))
    val in = MemoryStream[Page]
    in.addData(pages: _*)
    val q = DocStreams.tokenCounts(in.toDF(), "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("trend_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // a token arriving AFTER its window passed the watermark is dropped
      in.addData(Page(5, ts("2024-01-01 00:50:00"), "spark spark spark"))
      q.processAllAvailable()
      val sunk = spark.table("trend_sink")
      // hour 00: spark 3× (late ones dropped), scan 3×, join 1, table 1
      val top = DocStreams.trendingTerms(sunk, 2).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
      assert(top.take(2).map(t => (t._2, t._3)).toSeq == Seq(("scan", 3L), ("spark", 3L)),
        top.mkString(";"))
      // batch twin over the SAME on-time pages, finalized windows only
      val batch = DocStreams.trendingTerms(
        DocStreams.tokenCounts(pages.toDF(), "1 hour", "30 minutes")
          .filter($"window_start" < ts("2024-01-01 08:30:00")), 2)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getInt(3)))
      assert(top.toSeq == batch.toSeq, s"stream=${top.mkString(";")} batch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("ks drift monitor: no alert on the reference mix, fires on a shifted window, stream equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val (refCum, refN) = DocStreams.ksRefModel(corpus)
    assert(refCum.last == refN && refN > 0)
    val texts = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // window 00: the exact reference mix (D = 0); window 01: every text
    // padded +512 chars — the whole distribution shifts up 8 buckets
    val w0 = texts.map { case (id, t) => Page(id, ts("2024-01-01 00:10:00"), t) }
    val w1 = texts.map { case (id, t) =>
      Page(id, ts("2024-01-01 01:10:00"), t + ("x" * 512)) }
    val pusher = Page(-1, ts("2024-01-01 09:00:00"), "watermark pusher")
    val in = MemoryStream[Page]
    val q = DocStreams.ksDriftAlerts(in.toDF(), refCum, refN)
      .writeStream.format("memory").queryName("ks_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(w0.toIndexedSeq); q.processAllAvailable()
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(pusher); q.processAllAvailable()
      val sunk = spark.sql("SELECT * FROM ks_sink ORDER BY window_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
      assert(sunk.length == 2, sunk.mkString(";"))
      // reference window: identical distribution, sup exactly 0
      assert(sunk(0)._2 == refN && sunk(0)._3 == 0L && !sunk(0)._5, sunk(0).toString)
      // shifted window: drift must fire
      assert(sunk(1)._5, s"shifted window did not alert: ${sunk(1)}")
      // d_num recount from scratch for the shifted window
      val lens = texts.map(_._2.length + 512)
      val winCum = (0 until 64).map(b => lens.count(l => math.min(l / 64, 63) <= b).toLong)
      val dExp = (0 until 64).map(i =>
        math.abs(refN * winCum(i) - lens.length * refCum(i))).max
      assert(sunk(1)._3 == dExp)
      // batch twin over the on-time pages, finalized windows only
      val batch = DocStreams.ksDriftAlerts((w0 ++ w1).toSeq.toDF(), refCum, refN)
        .filter($"window_start" < ts("2024-01-01 08:30:00"))
        .orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
      assert(sunk.toSeq == batch.toSeq,
        s"stream=${sunk.mkString(";")} batch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("mann-whitney drift monitor: AUC exactly 500 on the reference mix, dominance fires on a shifted window, stream equals batch and both definitions of U") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val (refCnt, refN) = DocStreams.mwRefModel(corpus)
    assert(refCnt.sum == refN && refN > 0)
    val texts = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // window 00: the exact reference multiset — by symmetry U1 = n·refN/2,
    // so u1_x2 == n·refN and auc_milli == 500 exactly; window 01: every
    // text +512 chars — the window stochastically dominates the reference
    val w0 = texts.map { case (id, t) => Page(id, ts("2024-01-01 00:10:00"), t) }
    val w1 = texts.map { case (id, t) =>
      Page(id, ts("2024-01-01 01:10:00"), t + ("x" * 512)) }
    val pusher = Page(-1, ts("2024-01-01 09:00:00"), "watermark pusher")
    val in = MemoryStream[Page]
    val q = DocStreams.mwDriftAlerts(in.toDF(), refCnt, refN)
      .writeStream.format("memory").queryName("mw_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(w0.toIndexedSeq); q.processAllAvailable()
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(pusher); q.processAllAvailable()
      val sunk = spark.sql("SELECT * FROM mw_sink ORDER BY window_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
      assert(sunk.length == 2, sunk.mkString(";"))
      // reference window: u1_x2 == n·refN, AUC exactly 500, no dominance
      assert(sunk(0)._2 == refN && sunk(0)._3 == refN * refN &&
        sunk(0)._5 == 500L && !sunk(0)._6, sunk(0).toString)
      // identity from the batch query: u1_x2 + u2_x2 == 2·n·refN
      sunk.foreach(t => assert(t._3 + t._4 == 2 * t._2 * refN, t.toString))
      // shifted window: dominance fires, AUC well above 500
      assert(sunk(1)._6 && sunk(1)._5 > 900L, sunk(1).toString)
      // recount u1_x2 for the shifted window BOTH ways q_agg_mannwhitney
      // defines it: (a) tie-averaged doubled ranks over the pooled
      // 64-bucket support, (b) the all-pairs 2·wins + ties count
      val wb = texts.map { case (_, t) => math.min((t.length + 512) / 64, 63) }
      val winCnt = Array.tabulate(64)(b => wb.count(_ == b).toLong)
      var (cbPool, r1x2) = (0L, 0L)
      for (b <- 0 until 64) {
        val ct = refCnt(b) + winCnt(b)
        r1x2 += winCnt(b) * (2 * cbPool + ct + 1)
        cbPool += ct
      }
      val n1 = wb.length.toLong
      val rankU = r1x2 - n1 * (n1 + 1)
      val pairsU = (for (bw <- 0 until 64; br <- 0 until 64) yield {
        if (bw > br) 2 * winCnt(bw) * refCnt(br)
        else if (bw == br) winCnt(bw) * refCnt(br)
        else 0L
      }).sum
      assert(rankU == pairsU, s"rank-form $rankU != all-pairs $pairsU")
      assert(sunk(1)._3 == rankU, s"stream u1_x2 ${sunk(1)._3} != recount $rankU")
      // batch twin over the on-time pages, finalized windows only
      val batch = DocStreams.mwDriftAlerts((w0 ++ w1).toSeq.toDF(), refCnt, refN)
        .filter($"window_start" < ts("2024-01-01 08:30:00"))
        .orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
      assert(sunk.toSeq == batch.toSeq,
        s"stream=${sunk.mkString(";")} batch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("psi drift monitor: zero on the reference window, per-source psi equals the batch catalog query, major shift fires on drifted content, stream equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val (refCnt, refN) = DocStreams.psiRefModel(corpus)
    assert(refCnt.sum == refN && refN > 0)
    val docs = corpus.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // window 00: the corpus verbatim — src0's row IS the reference
    // multiset (every PSI term is ln(1), so psi_nano is exactly 0), and
    // every other source must reproduce the batch catalog query's psi
    // bit-for-bit (same window totals ⇔ same corpus totals)
    val w0 = docs.map { case (id, src, t) =>
      SPage(id, ts("2024-01-01 00:10:00"), src, t) }
    // window 01: a new source serving two tokens on repeat — major shift
    val w1 = (1 to 50).map(i =>
      SPage(-i.toLong, ts("2024-01-01 01:10:00"), "srcX", "zz qq zz qq zz qq"))
    val pusher = SPage(-999L, ts("2024-01-01 09:00:00"), "src0", "watermark pusher")
    val in = MemoryStream[SPage]
    val q = DocStreams.psiDriftAlerts(in.toDF(), refCnt, refN)
      .writeStream.format("memory").queryName("psi_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(w0.toIndexedSeq); q.processAllAvailable()
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(pusher); q.processAllAvailable()
      val sunk = spark.sql("SELECT * FROM psi_sink ORDER BY window_start, source")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      // src0's reference window scores exactly zero
      val self = sunk.find(t => t._2 == "src0" && t._1.startsWith("2024-01-01 00:")).get
      assert(self._3 == refN && self._4 == 0L && !self._5, self.toString)
      // every other w0 source matches the batch catalog query exactly
      val batchPsi = SparkEntry.queries("q_text_psi_bysource")(spark, sf).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getBoolean(4)))).toMap
      val w0Rows = sunk.filter(t => t._1.startsWith("2024-01-01 00:") && t._2 != "src0")
      assert(w0Rows.nonEmpty && w0Rows.length == batchPsi.size, w0Rows.mkString(";"))
      w0Rows.foreach { t =>
        assert(batchPsi(t._2) == ((t._3, t._4, t._5, t._6)), t.toString) }
      // the drifted srcX window fires the major-shift page
      val drift = sunk.find(_._2 == "srcX").get
      assert(drift._4 > 250000000L && drift._6, drift.toString)
      // batch twin over the same pages, finalized windows only
      val batch = DocStreams.psiDriftAlerts((w0 ++ w1).toSeq.toDF(), refCnt, refN)
        .filter(col("window_start") < ts("2024-01-01 08:30:00"))
        .orderBy("window_start", "source").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      assert(sunk.toSeq == batch.toSeq,
        s"stream=${sunk.mkString(";")} batch=${batch.mkString(";")}")
    } finally q.stop()
  }

  test("sequence packer at ingest: stream equals the per-source prefix-sum batch twin; windows are gap-free") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    // the corpus with a synthetic arrival order (ts = doc_id seconds)
    val docs = Tables.df(spark, sf, "documents")
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).as("n_tokens"))
      .collect()
      .map(r => streaming.PackDoc(r.getLong(0),
        new Timestamp(1700000000000L + r.getLong(0) * 1000L), r.getString(1), r.getInt(2)))
      .sortBy(d => (d.ts.getTime, d.doc_id))
    val in = MemoryStream[streaming.PackDoc]
    val q = streaming.DocStreams.packAtIngest(in.toDS())
      .writeStream.format("memory").queryName("pack_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // three arrival waves, in event-time order (the order contract)
      docs.grouped(math.max(docs.length / 3, 1)).foreach { wave =>
        in.addData(wave.toIndexedSeq); q.processAllAvailable()
      }
      val got = spark.sql("SELECT * FROM pack_sink").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(t => (t._1, t._4))
      assert(got.length == docs.length)
      // batch twin: the same per-source prefix sum as a window function
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("ts", "doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val batch = docs.toSeq.toDF()
        .withColumn("tok_start", coalesce(sum("n_tokens").over(w), lit(0L)))
        .select(col("source"), col("doc_id"), col("n_tokens"), col("tok_start"),
          expr("tok_start div 256").as("seq_first"),
          expr("(tok_start + greatest(n_tokens, 1) - 1) div 256").as("seq_last"),
          expr("(tok_start + greatest(n_tokens, 1) - 1) div 256" +
            " - tok_start div 256 + 1").as("n_seqs"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
        .sortBy(t => (t._1, t._4))
      assert(got.toSeq == batch.toSeq)
      // gap-free: within each source the offsets tile exactly
      got.groupBy(_._1).foreach { case (src, rows) =>
        val sorted = rows.sortBy(_._4)
        assert(sorted.head._4 == 0L, src)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._4 == a._4 + a._3, s"$src: $a -> $b")
          case _ =>
        }
      }
    } finally q.stop()
  }

  test("bloom gate at ingest: quarantine is a superset of the exact audit; stream equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val bloom = DocStreams.bloomModel(corpus)
    val docs = corpus.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[Doc]
    val q = DocStreams.bloomGate(in.toDF(), bloom)
      .writeStream.format("memory").queryName("bloom_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      docs.grouped(math.max(docs.length / 2, 1)).foreach { wave =>
        in.addData(wave.map { case (id, src, t) =>
          Doc(id, t, "en", src, t.length.toLong) }.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM bloom_sink ORDER BY doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
      assert(streamed.length == docs.length)
      // stream == the identical batch expression (bloom bits are frozen)
      val batch = DocStreams.bloomGate(corpus, bloom).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))
      assert(streamed.toSeq == batch.toSeq)
      // structural recall: every doc the exact audit flags is quarantined
      val quarantined = streamed.filter(_._5).map(_._1).toSet
      val exactFlagged = SparkEntry.queries("q_cur_decontaminate")(spark, sf)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(exactFlagged.nonEmpty && exactFlagged.subsetOf(quarantined),
        s"missed: ${exactFlagged -- quarantined}")
      // eval docs themselves quarantine (their shingles ARE the filter);
      // the release side must still keep a clean majority
      val nonEval = streamed.filter(_._2 != "src0")
      assert(nonEval.count(!_._5) > nonEval.length / 2, "gate quarantined most of the corpus")
    } finally q.stop()
  }

  test("mad gate at ingest: frozen thresholds flag exactly the batch audit's outliers; unknown sources pass") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val model = DocStreams.madModel(corpus)
    assert(model.nonEmpty)
    val docs = corpus.select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => Doc(r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    val novel = Doc(-1L, "x", "en", "brand_new_source", 999999L)
    val in = MemoryStream[Doc]
    val q = DocStreams.madGate(in.toDF(), model)
      .writeStream.format("memory").queryName("mad_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      val (w1, w2) = docs.splitAt(docs.length / 2)
      in.addData(w1.toIndexedSeq); q.processAllAvailable()
      in.addData(w2.toIndexedSeq :+ novel); q.processAllAvailable()
      val sunk = spark.sql("SELECT * FROM mad_sink").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(3), r.getBoolean(4))).toMap
      assert(sunk.size == docs.length + 1)
      // an unseen source is kept (audit-new-sources-first), not dropped
      assert(sunk(-1L) == (("brand_new_source", false, true)))
      // per-source outlier counts equal the batch audit's n_outliers
      val streamCounts = sunk.view.filterKeys(_ >= 0).values
        .groupBy(_._1).map { case (src, vs) => src -> vs.count(_._2).toLong }
      val audit = SparkEntry.queries("q_cur_mad_outliers")(spark, sf).collect()
        .map(r => r.getString(0) -> r.getLong(4)).toMap
      assert(streamCounts == audit,
        s"stream=$streamCounts\naudit=$audit")
      // batch twin of the same helper agrees row-for-row
      val batch = DocStreams.madGate(corpus, model).collect()
        .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      docs.foreach(d => assert(batch(d.doc_id) == sunk(d.doc_id)._2, s"doc ${d.doc_id}"))
    } finally q.stop()
  }

  test("redactPii at ingest: stream equals batch, nothing PII-shaped survives the sink") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val docs = Seq(
      Doc(1, "write to alice99@mail.example.com or bob@x.org today", "en", "s1", 52),
      Doc(2, "call 555-0192 then 555-7777 about the offer", "en", "s1", 43),
      Doc(3, "clean document with no contact info at all", "en", "s2", 42),
      Doc(4, "mixed c@d.ee and 555-0000 in one line", "en", "s2", 37))
    val in = MemoryStream[Doc]
    in.addData(docs: _*)
    val q = DocStreams.redactPii(in.toDF())
      .writeStream.format("memory").queryName("pii_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM pii_sink ORDER BY doc_id").collect()
      val batch = DocStreams.redactPii(docs.toDF()).orderBy("doc_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      val byId = streamed.map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(3), r.getString(4)))).toMap
      assert(byId(1) == ((2, 0, "write to <EMAIL> or <EMAIL> today")))
      assert(byId(2) == ((0, 2, "call <PHONE> then <PHONE> about the offer")))
      assert(byId(3)._3 == docs(2).text) // untouched
      assert(byId(4) == ((1, 1, "mixed <EMAIL> and <PHONE> in one line")))
      streamed.foreach { r =>
        assert(!r.getString(4).matches(".*[a-z0-9]+@[a-z.]+[a-z].*"))
        assert(!r.getString(4).matches(".*555-[0-9]{4}.*"))
      }
    } finally q.stop()
  }

  test("streaming REAL image decode equals the closed-form pixel oracle and the batch twin") {
    // the multimodal ingest stage: PNG payloads arrive on the stream,
    // each micro-batch decodes through the ACTUAL JDK codec; the sink
    // must match both the formula (engine-free ground truth) and the
    // batch run of the same helper over the same corpus
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val ids = (0L until 60L).toSeq
    def rec(id: Long): (Long, Array[Byte]) = {
      val (w, h) = ((16 + id % 64).toInt, (16 + id % 48).toInt)
      id -> MultimodalQueries.encodePng(id, w, h)
    }
    val in = MemoryStream[(Long, Array[Byte])]
    val q = DocStreams.decodeImageStats(in.toDS())
      .writeStream.format("memory").queryName("img_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      val (w1, w2) = ids.splitAt(30)
      in.addData(w1.map(rec)); q.processAllAvailable()
      in.addData(w2.map(rec)); q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM img_sink ORDER BY doc_id").collect()
      assert(streamed.length == 60)
      streamed.foreach { r =>
        val id = r.getLong(0)
        val (w, h) = ((16 + id % 64).toInt, (16 + id % 48).toInt)
        assert(r.getInt(1) == w && r.getInt(2) == h, s"dims for doc $id")
        val exp = (0 until 3).map(c =>
          (for (y <- 0 until h; x <- 0 until w)
            yield MultimodalQueries.pix(id, x, y, c).toLong).sum)
        assert((r.getLong(3), r.getLong(4), r.getLong(5)) ==
          ((exp(0), exp(1), exp(2))), s"pixel sums for doc $id")
      }
      val batch = DocStreams.decodeImageStats(ids.map(rec).toDS())
        .orderBy("doc_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming REAL video decode: per-frame rows equal the pixel formula and the batch twin") {
    // animated-GIF payloads on the stream: every stored frame decodes
    // through the real ImageReader per micro-batch, one row per frame
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val ids = (0L until 40L).toSeq
    def dims(id: Long) = ((8 + id % 16).toInt, (8 + id % 12).toInt, (2 + id % 4).toInt)
    def rec(id: Long): (Long, Array[Byte]) = {
      val (w, h, nf) = dims(id)
      id -> MultimodalQueries.encodeGif(id, w, h, nf)
    }
    val in = MemoryStream[(Long, Array[Byte])]
    val q = DocStreams.decodeVideoFrames(in.toDS())
      .writeStream.format("memory").queryName("vid_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      val (w1, w2) = ids.splitAt(20)
      in.addData(w1.map(rec)); q.processAllAvailable()
      in.addData(w2.map(rec)); q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM vid_sink ORDER BY doc_id, frame_idx").collect()
      assert(streamed.length == ids.map(id => dims(id)._3).sum)
      streamed.foreach { r =>
        val id = r.getLong(0)
        val (w, h, nf) = dims(id)
        val f = r.getInt(2)
        assert(r.getInt(1) == nf && r.getLong(3) == w.toLong * h, s"doc $id frame $f")
        val pix = for (y <- 0 until h; x <- 0 until w)
          yield MultimodalQueries.gifPix(id, f, x, y)
        assert((r.getLong(4), r.getInt(5), r.getInt(6)) ==
          ((pix.map(_.toLong).sum, pix.min, pix.max)), s"doc $id frame $f stats")
      }
      val batch = DocStreams.decodeVideoFrames(ids.map(rec).toDS())
        .orderBy("doc_id", "frame_idx").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming REAL audio decode equals the closed-form sample oracle and the batch twin") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val ids = (0L until 40L).toSeq
    def rec(id: Long): (Long, Array[Byte]) =
      id -> MultimodalQueries.encodeWav(id, (256 + id % 512).toInt)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = DocStreams.decodeAudioStats(in.toDS())
      .writeStream.format("memory").queryName("wav_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      val (w1, w2) = ids.splitAt(20)
      in.addData(w1.map(rec)); q.processAllAvailable()
      in.addData(w2.map(rec)); q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM wav_sink ORDER BY doc_id").collect()
      assert(streamed.length == 40)
      streamed.foreach { r =>
        val id = r.getLong(0)
        val n = (256 + id % 512).toInt
        val exp = (0 until n).map(MultimodalQueries.samp(id, _))
        assert(r.getLong(1) == n.toLong, s"n for doc $id")
        assert(r.getLong(2) == exp.map(_.toLong).sum, s"sum for doc $id")
        assert(r.getLong(3) == exp.map(v => math.abs(v).toLong).sum, s"abs for doc $id")
        assert((r.getInt(4), r.getInt(5)) == ((exp.min, exp.max)), s"minmax for doc $id")
      }
      val batch = DocStreams.decodeAudioStats(ids.map(rec).toDS())
        .orderBy("doc_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming decontamination flags a superset of the per-eval-doc batch audit") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val docsDf = Tables.df(spark, sf, "documents")
    val evalSh = DocStreams.evalShingleSet(docsDf.filter(col("source") === "src0"))
    assert(evalSh.nonEmpty)
    val corpus = docsDf.filter(col("source") =!= "src0")
      .select("doc_id", "text", "lang", "source", "n_chars").as[Doc].collect().toSeq
    val in = MemoryStream[Doc]
    val q = DocStreams.decontaminate(in.toDF(), evalSh)
      .writeStream.format("memory").queryName("decon")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(corpus); q.processAllAvailable()
      val flagged = spark.sql("SELECT doc_id FROM decon WHERE contaminated").collect()
        .map(_.getLong(0)).toSet
      // exact per-doc recount of the union-overlap semantics
      def tris(t: String): Set[String] = {
        val w = t.split(" ", -1)
        if (w.length < 3) Set.empty
        else w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      val evalSet = evalSh.toSet
      val expect = corpus.filter(d => (tris(d.text) & evalSet).size >= 5).map(_.doc_id).toSet
      assert(flagged == expect)
      // and it must catch at least everything the finer batch audit catches
      val batchFlagged = SparkEntry.queries("q_cur_decontaminate")(spark, sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(batchFlagged.subsetOf(flagged),
        s"missed by ingest filter: ${batchFlagged -- flagged}")
      assert(batchFlagged.nonEmpty)
    } finally q.stop()
  }

  test("streaming ingest curation: per-micro-batch output equals the batch filter") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val docs = Tables.df(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().toSeq
    val in = MemoryStream[Doc]
    val q = DocStreams.curate(in.toDF())
      .writeStream.format("memory").queryName("curated")
      .outputMode(OutputMode.Append()).start()
    try {
      // arbitrary micro-batch boundaries must not affect row-local curation
      val (b1, rest) = docs.splitAt(docs.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.sql("SELECT doc_id FROM curated").collect()
        .map(_.getLong(0)).toSet
      val batch = DocStreams.curate(Tables.df(spark, sf, "documents")).collect()
        .map(_.getLong(0)).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty && streamed.size < docs.size)
    } finally q.stop()
  }

  test("streaming DSIR scoring with the frozen model matches the batch selection") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    val corpus = Tables.df(spark, sf, "documents")
    val model = DocStreams.dsirModel(corpus)
    assert(model.nonEmpty && model.size <= 1024)
    val docs = corpus.select("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().toSeq
    val in = MemoryStream[Doc]
    val q = DocStreams.dsirScore(in.toDF(), model)
      .writeStream.format("memory").queryName("dsir_scored")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = docs.splitAt(docs.length / 2)
      Seq(b1, b2).foreach { b => in.addData(b); q.processAllAvailable() }
      // top-100 of the streamed scores must equal the catalog query's
      // oracle-verified selection (same fixed-point model, so equality
      // is exact, not approximate)
      val streamedTop = spark.sql("SELECT doc_id, wfp, dsir_w FROM dsir_scored")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy { case (id, w, _) => (-w, id) }.take(100)
        .map { case (id, _, dw) => id -> dw }
      val batchTop = SparkEntry.queries("q_cur_dsir")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      assert(streamedTop.toSeq == batchTop.toSeq)
    } finally q.stop()
  }

  test("streaming rate alerts fire only for the burst user, finalized once, equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    // user 7: 8 events inside one minute (breach); user 9: 3 events
    // spread out (quiet); far-future pusher finalizes the windows
    val events =
      (0 until 8).map(i => Event(100 + i, ts(f"2024-01-01 10:00:${i * 7}%02d"), 7, "click", 0.0)) ++
        Seq(Event(200, ts("2024-01-01 10:00:30"), 9, "view", 0.0),
          Event(201, ts("2024-01-01 10:05:00"), 9, "view", 0.0),
          Event(202, ts("2024-01-01 10:10:00"), 9, "view", 0.0),
          Event(999, ts("2024-01-01 23:00:00"), 1, "click", 0.0))
    val in = MemoryStream[Event]
    in.addData(events: _*)
    val q = EventStreams.rateAlerts(in.toDF(), limit = 5)
      .writeStream.format("memory").queryName("rate_alerts")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM rate_alerts ORDER BY minute_start").collect()
      assert(rows.length == 1, rows.mkString(";"))
      assert(rows(0).getLong(1) == 7L && rows(0).getLong(2) == 8L)
      // identical code in batch over the same frame (watermark inert)
      val batch = EventStreams.rateAlerts(events.toDF(), limit = 5).collect()
      assert(batch.map(_.toString).toSeq == rows.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming encoding QA flags corrupt ingests, passes clean ones, equals batch") {
    val s = spark
    implicit val sq = s.sqlContext
    import s.implicits._
    // clean corpus docs + hand-corrupted variants hitting each flag class
    val clean = Tables.df(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").as[Doc]
      .collect().take(20).toSeq
    val corrupt = Seq(
      Doc(9001L, "broken \uFFFD decode artifact here", "en", "srcX", 30),
      Doc(9002L, "binary\u0007bleed in the middle", "en", "srcX", 25),
      Doc(9003L, "short text " + ("é" * 40), "en", "srcX", 51))
    val all = clean ++ corrupt
    val in = MemoryStream[Doc]
    val q = DocStreams.encodingFlags(in.toDF())
      .writeStream.format("memory").queryName("enc_qa")
      .outputMode(OutputMode.Append()).start()
    try {
      val (b1, b2) = all.splitAt(10)
      Seq(b1, b2).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.sql("SELECT * FROM enc_qa ORDER BY doc_id").collect()
      val batch = DocStreams.encodingFlags(all.toDF()).orderBy("doc_id").collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
      val keep = streamed.map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      clean.foreach(d => assert(keep(d.doc_id), s"clean doc ${d.doc_id} quarantined"))
      val flags = streamed.filter(_.getLong(0) >= 9001L)
        .map(r => r.getLong(0) -> ((r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
      assert(flags(9001L)._1 && !keep(9001L))
      assert(flags(9002L)._2 && !keep(9002L))
      assert(flags(9003L)._3 && !keep(9003L))
    } finally q.stop()
  }

  test("decade soak: sessionize streams the sf1 corpus (1M events) with state ∝ users, stream ≡ batch") {
    // Round-14 verdict item #7: the RocksDB soak above is 100 synthetic
    // micro-batches at gate SF — no streaming path had seen 10× state.
    // This drives the heaviest stateful twin over the REAL ScaleUp sf1
    // events corpus (1M events, 15k users, 30 days), sliced into
    // chronological parquet files so the file source replays it as a
    // month of micro-batches, and pins the two things that matter at
    // 100 TB: (a) peak state is O(active users) — one open session each
    // — never O(events seen); (b) the streamed result equals the batch
    // recompute exactly: closed-at-end = total sessions (lag-gap count)
    // minus one still-open session per user. Env-conditional on the
    // ScaleUp artifact (the sf-decade convention).
    sessionizeSoak("/tmp/graft_sf1")
  }

  test("decade soak at sf10: sessionize streams 10M events, state still ∝ users (GRAFT_DECADE=1)") {
    // Round-15 verdict item #6: the sf1 soak proved state ∝ users at 1M
    // events; this is the same protocol one decade up (10M events —
    // RocksDB compaction behavior only shows at this state-churn
    // volume). Gated behind GRAFT_DECADE=1: it is a round-close gate,
    // not an inner-loop test (the sf-decade convention + the round-15
    // suite time-box).
    assume(sys.env.get("GRAFT_DECADE").contains("1"),
      "sf10 soak is a round-close gate — set GRAFT_DECADE=1")
    sessionizeSoak("/tmp/graft_sf10")
  }

  test("decade soak at sf10: DAU/HLL day-sketch streams 10M events, state ∝ |days| (GRAFT_DECADE=1)") {
    // Round-16 verdict item #6: the second artifact-backed stateful twin
    // gets the same decade protocol as sessionize — the day-sketch's
    // state contract is ONE bounded HLL buffer per OPEN day window
    // (closing as the watermark advances), so peak state must track
    // |days|, never |users| or event volume. Previously sf0.1-only
    // evidence (MemoryStream); this replays the 10M-event ScaleUp
    // corpus as chronological file micro-batches on RocksDB.
    assume(sys.env.get("GRAFT_DECADE").contains("1"),
      "sf10 soak is a round-close gate — set GRAFT_DECADE=1")
    daySketchSoak("/tmp/graft_sf10")
  }

  /** The day-sketch decade-soak protocol: chronological 3-day slices of
    * the real events table replayed as file micro-batches on RocksDB,
    * plus one far-future pusher slice so every REAL day finalizes.
    * Pins: peak state ≤ |days| + 1 open windows, stream ≡ the identical
    * batch sketch expression on every real day, and each day within 10%
    * of exact COUNT(DISTINCT). */
  private def daySketchSoak(sfDir: String): Unit = {
    val srcDir = s"$sfDir/events.parquet"
    assume(new java.io.File(srcDir).exists(), s"$srcDir absent — run graft.ScaleUp")
    val s = spark
    import org.apache.spark.sql.functions.{countDistinct, unix_millis, window}
    val ev = Tables.df(s, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val maxTs = ev.agg(org.apache.spark.sql.functions.max(unix_millis(col("ts"))))
      .head().getLong(0)
    val nDays = ev.select(window(col("ts"), "1 day").as("w"))
      .select(col("w.start")).distinct().count()
    val sliceMs = 3L * 86400000
    val sliced = ev.withColumn("slice",
      ((unix_millis(col("ts")) - lit(1704067200000L)) / sliceMs).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_decade_dau").toString
    val slices = sliced.select("slice").distinct().collect().map(_.getInt(0)).sorted
    for (i <- slices) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dslice").toString
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, f"slice-$i%02d.parquet"))
      Thread.sleep(20)
    }
    // pusher: one event two days past the corpus finalizes every real
    // day under the 1h watermark; its own day never closes (nothing
    // follows), so it is absent from the emitted set by construction
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("graft_dslice").toString
      val st = s
      import st.implicits._
      Seq((-1L, new Timestamp(maxTs + 2L * 86400000), -1L, "click", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "slice-zz-pusher.parquet"))
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val in = s.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
    val q = EventStreams.dauSketch(in).writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          emitted.add((r.getTimestamp(0).getTime, r.getLong(1)))); ()
      }
      .start()
    try {
      q.processAllAvailable()
      val progresses = q.recentProgress.toSeq
      val maxState = progresses.flatMap(_.stateOperators).map(_.numRowsTotal).max
      val streamed = {
        val it = emitted.iterator(); val b = Seq.newBuilder[(Long, Long)]
        while (it.hasNext) b += it.next(); b.result().sortBy(_._1)
      }
      info(s"day-sketch soak $sfDir: peak state $maxState rows, $nDays days, " +
        s"${streamed.size} days emitted, ${progresses.count(_.numInputRows > 0)} non-empty batches")
      assert(maxState <= nDays + 1,
        s"peak state $maxState exceeds $nDays day windows + pusher — " +
          "state is accreting with users/events, not days")
      assert(progresses.count(_.numInputRows > 0) >= slices.length - 1,
        "corpus must arrive over many micro-batches, not one")
      // stream vs the identical batch expression: same DAYS exactly; the
      // ESTIMATES agree only to estimator tolerance at this volume —
      // with ~135k users/day the HLL goes dense, and the library's
      // estimate then depends on the merge topology (a directly-updated
      // sketch keeps its HIP accumulator, a union result falls back to
      // the composite estimator), which micro-batch replay necessarily
      // changes. Registers are order-insensitive; the estimator path is
      // not. Observed drift ~0.5-1.5%; pin ≤3% relative (the sf0.1
      // MemoryStream test keeps EXACT equality — same topology there).
      val batch = EventStreams.dauSketch(ev).orderBy("day_start").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1))).toSeq
      assert(streamed.map(_._1) == batch.map(_._1),
        s"day sets differ: stream(${streamed.size}) vs batch(${batch.size})")
      streamed.zip(batch).foreach { case ((day, se), (_, be)) =>
        assert(math.abs(se - be) <= 0.03 * be,
          s"day=$day stream=$se batch=$be — beyond estimator tolerance")
      }
      // and each finalized day sits within 10% of exact distinct users
      val exact = ev.groupBy(window(col("ts"), "1 day"))
        .agg(countDistinct(col("user_id")).as("dau"))
        .select(col("window.start"), col("dau")).collect()
        .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
      streamed.foreach { case (day, est) =>
        val ex = exact(day)
        assert(math.abs(est - ex) <= 0.1 * ex, s"day=$day est=$est exact=$ex")
      }
    } finally {
      q.stop()
      prev match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }

  /** The sessionize decade-soak protocol, parameterized by ScaleUp
    * corpus: slice the real events table into chronological 3-day
    * parquet files, replay them as micro-batches on the RocksDB
    * provider, pin peak state ≤ |users| and stream ≡ batch exactly. */
  private def sessionizeSoak(sfDir: String): Unit = {
    val srcDir = s"$sfDir/events.parquet"
    assume(new java.io.File(srcDir).exists(), s"$srcDir absent — run graft.ScaleUp")
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lag, unix_millis}
    val gapMs = 30L * 60 * 1000
    val ev = Tables.df(s, sfDir, "events")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    // batch truth: a session starts at a user's first event or after a
    // >gap silence; at stream end each user's LAST session is still open
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sessions = ev
      .withColumn("prev", lag(unix_millis(col("ts")), 1).over(w))
      .filter(col("prev").isNull ||
        unix_millis(col("ts")) - col("prev") > gapMs)
      .count()
    val users = ev.select("user_id").distinct().count()
    // chronological three-day slices, one file each, arrival-ordered
    // (mod time + zero-padded name both increase with event time)
    val sliceMs = 3L * 86400000
    val sliced = ev.withColumn("slice",
      ((unix_millis(col("ts")) - lit(1704067200000L)) / sliceMs).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("graft_decade_stream").toString
    val slices = sliced.select("slice").distinct().collect().map(_.getInt(0)).sorted
    for (i <- slices) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_slice").toString
      sliced.filter(col("slice") === i).drop("slice")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, f"slice-$i%02d.parquet"))
      Thread.sleep(20)
    }
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val closed = new java.util.concurrent.atomic.LongAdder
    val in = s.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir).as[Event]
    val q = EventStreams.sessionize(in).writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[graft.streaming.Session], _: Long) =>
        closed.add(b.count())
      }
      .start()
    try {
      q.processAllAvailable()
      val progresses = q.recentProgress.toSeq
      val maxState = progresses.flatMap(_.stateOperators).map(_.numRowsTotal).max
      info(s"soak $sfDir: peak state $maxState rows, $users users, " +
        s"${closed.sum()} sessions closed, ${progresses.count(_.numInputRows > 0)} non-empty batches")
      assert(maxState <= users,
        s"peak state $maxState rows exceeds $users users — state is accreting with events")
      assert(progresses.count(_.numInputRows > 0) >= slices.length - 1,
        "corpus must arrive over many micro-batches, not one")
      assert(closed.sum() == sessions - users,
        s"streamed closed=${closed.sum()} vs batch sessions=$sessions - $users open")
    } finally {
      q.stop()
      prev match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }
}
