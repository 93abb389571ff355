package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventStreamSpec extends SparkSpec {

  test("streaming windowed agg matches the batch twin's expressions (H6)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("eventTime", "event_type", "value")
    val q = EventStream.run(spark, events,
      Files.createTempDirectory("graft-ckpt").toString, "win_test")
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.5),
        (ts("2024-01-01 10:55:00"), "click", 2.5),
        (ts("2024-01-01 11:05:00"), "click", 4.0),
        (ts("2024-01-01 10:30:00"), "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("win_test")
        .orderBy("window_start", "event_type").collect()
      assert(out.length == 3)
      val first = out(0) // 10:00 window, click
      assert(first.getAs[Long]("n_events") == 2)
      assert(first.getAs[Double]("sum_value") == 4.0)
    } finally q.stop()
  }

  test("session_window streaming agg merges by gap and closes on watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val events = input.toDF().toDF("eventTime", "user_id")
    val q = EventStream.sessionWindows(events)
      .writeStream.queryName("sess_test")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-sess").toString)
      .format("memory")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:10:00"), 1L), // same session (gap 10m < 30m)
        (ts("2024-01-01 11:30:00"), 1L), // new session  (gap 80m)
        (ts("2024-01-01 10:05:00"), 2L))
      q.processAllAvailable()
      val out = spark.table("sess_test")
        .orderBy("user_id", "session_start").collect()
      assert(out.length == 3)
      assert(out(0).getAs[Long]("n_events") == 2) // user 1, merged session
      assert(out(1).getAs[Long]("n_events") == 1) // user 1, second session
      assert(out(2).getAs[Long]("n_events") == 1) // user 2
    } finally q.stop()
  }

  test("sessionize: cross-batch late event cannot rewind the session window") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    // idleTimeout=None: processAllAvailable cannot quiesce under
    // ProcessingTimeTimeout (the engine keeps running timer-check batches)
    val q = EventStream.sessionize(input.toDS(), idleTimeout = None)
      .writeStream.queryName("late_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-late").toString)
      .format("memory")
      .start()
    try {
      input.addData((7L, 1000L), (7L, 2000L))
      q.processAllAvailable()
      input.addData((7L, 1900L)) // late: must NOT rewind last to 1900
      q.processAllAvailable()
      input.addData((7L, 3701L)) // 3701-2000=1701 < 1800 -> SAME session
      q.processAllAvailable()
      val out = spark.table("late_test").collect()
      // no closed session may ever be emitted: the late event is absorbed
      assert(!out.exists(r => !r.getAs[Boolean]("open")),
        s"spurious session split: ${out.mkString(", ")}")
      val last = out.filter(_.getAs[Boolean]("open"))
        .maxBy(r => r.getAs[Long]("nEvents"))
      assert(last.getAs[Long]("sessionStart") == 1000L)
      assert(last.getAs[Long]("sessionEnd") == 3701L)
      assert(last.getAs[Long]("nEvents") == 4L)
    } finally q.stop()
  }

  test("streaming dedup keeps first arrival per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val docs = input.toDF().toDF("eventTime", "doc_id", "text")
    val q = EventStream.dedupStream(docs)
      .writeStream.queryName("dedup_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-dedup").toString)
      .format("memory")
      .start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (ts("2024-01-01 10:00:00"), 1L, "Hello,  World!"),
        (ts("2024-01-01 10:01:00"), 2L, "hello world"), // same normalized fp
        (ts("2024-01-01 10:02:00"), 3L, "something else"))
      q.processAllAvailable()
      input.addData( // second batch, still inside the horizon
        (ts("2024-01-01 10:03:00"), 4L, "HELLO world"))
      q.processAllAvailable()
      val kept = spark.table("dedup_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(kept.toSeq == Seq(1L, 3L),
        s"expected first arrivals only, got ${kept.mkString(",")}")
    } finally q.stop()
  }

  test("mapGroupsWithState sessionization tracks gap-separated sessions") {
    implicit val s = spark
    import spark.implicits._
    // batch Dataset exercises the same state-transition function
    val events = Seq(
      (7L, 1000L), (7L, 1100L), (7L, 5000L), // gap > 1800 -> new session
      (8L, 100L)).toDS()
    val out = EventStream.sessionize(events).collect()
      .groupBy(_.userId).map { case (k, v) => k -> v.sortBy(_.sessionStart) }
    // user 7: the CLOSED 2-event session is emitted, not just the latest
    assert(out(7L).map(s => (s.sessionStart, s.nEvents, s.open)).toSeq ==
      Seq((1000L, 2L, false), (5000L, 1L, true)))
    assert(out(8L).map(s => (s.sessionStart, s.nEvents, s.open)).toSeq ==
      Seq((100L, 1L, true)))
  }

  test("funnelStages advances per-user across micro-batches; out-of-window ignored") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val q = EventStream.funnelStages(input.toDS(), windowSec = 1000L,
      idleTimeout = None) // see sessionize note on ProcessingTimeTimeout
      .writeStream.queryName("funnel_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-fnl").toString)
      .format("memory")
      .start()
    try {
      // batch 1: user 1 views; user 2 clicks with NO prior view (ignored)
      input.addData((1L, "view", 100L), (2L, "click", 100L))
      q.processAllAvailable()
      // batch 2: user 1 clicks in-window; user 2 views then out-of-window
      // click (2000 > 200+1000)
      input.addData((1L, "click", 600L), (2L, "view", 200L),
        (2L, "click", 2000L))
      q.processAllAvailable()
      // batch 3: user 1 purchases in-window -> completes (state removed);
      // a SECOND purchase must emit nothing (funnel done)
      input.addData((1L, "purchase", 900L), (1L, "purchase", 950L))
      q.processAllAvailable()
      val got = spark.table("funnel_test")
        .as[(Long, Int, Long)].collect().toSeq.sorted
      assert(got == Seq((1L, 1, 100L), (1L, 2, 600L), (1L, 3, 900L),
        (2L, 1, 200L)))
    } finally q.stop()
  }

  test("anomalyStream flags a burst against the trailing baseline with bounded state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Long)]
    val q = EventStream.anomalyStream(input.toDS())
      .writeStream.queryName("anomaly_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-anom").toString)
      .format("memory")
      .start()
    try {
      // batch 1: steady clicks — 1/minute for minutes 0..9
      input.addData((0L to 9L).map(m => ("click", m * 60 + 5)): _*)
      q.processAllAvailable()
      // batch 2: a 5-event burst in minute 10 (baseline = 1.0 -> lift 5)
      // and a steady "view" minute that must NOT inherit click state
      input.addData(Seq.fill(5)(("click", 10L * 60 + 1)) :+ (("view", 600L)): _*)
      q.processAllAvailable()
      val rows = spark.table("anomaly_test")
        .as[(String, Long, Long, Option[Double], Int)].collect().toSeq
      val clicks = rows.filter(_._1 == "click").sortBy(_._2)
      // minute 0 has no trailing baseline -> never anomalous
      assert(clicks.head == (("click", 0L, 1L, None, 0)))
      // steady minutes: baseline 1.0, not anomalous
      assert(clicks.filter(r => r._2 >= 60 && r._2 <= 540)
        .forall(r => r._4.contains(1.0) && r._5 == 0))
      // the burst minute flags at 5x lift
      assert(clicks.last == (("click", 600L, 5L, Some(1.0), 1)))
      // the other type's first minute starts from its OWN empty state
      assert(rows.filter(_._1 == "view") == Seq(("view", 600L, 1L, None, 0)))
    } finally q.stop()
  }

  test("anomalyStream on one batch equals the declared batch query on real data") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // With the whole log in ONE micro-batch, every minute's trailing
    // baseline sees exactly the same present-minute set as the batch
    // query's RANGE frame (minutes process in ascending order and all
    // counts are final), so the twins must agree row for row.
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.t(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        graft.Tables.nanosToEpochSec(
          org.apache.spark.sql.functions.col("ts")).as("sec"))
      .as[(String, Long)].collect().toSeq
    val input = MemoryStream[(String, Long)]
    val q = EventStream.anomalyStream(input.toDS())
      .writeStream.queryName("anomaly_diff")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-anomdiff").toString)
      .format("memory")
      .start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      val streamed = spark.table("anomaly_diff")
        .as[(String, Long, Long, Option[Double], Int)].collect()
        .map { case (t, m, c, b, a) =>
          (t, m, c, b.map(x => BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), a)
        }.sortBy(r => (r._1, r._2)).toSeq
      val batch = graft.Registry.queryMap("q_event_anomaly")(spark, dir)
        .select("event_type", "minute", "cnt", "baseline", "anomalous")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getInt(4)))
        .sortBy(r => (r._1, r._2)).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("attributionJoin on one batch equals the declared batch query's " +
    "all-touch rows on real data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val dir = "/root/testdata/sf0.001"
    def side(kind: String) = graft.Tables.t(spark, dir, "events")
      .filter(col("event_type") === kind)
      .select(timestamp_seconds(
          graft.Tables.nanosToEpochSec(col("ts"))).as("t"),
        col("user_id"), col("event_id"))
      .as[(java.sql.Timestamp, Long, Long)].collect().toSeq
    val vIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val cIn = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val q = EventStream.attributionJoin(
      vIn.toDF().toDF("viewTime", "user_id", "view_id"),
      cIn.toDF().toDF("clickTime", "user_id", "click_id"))
      .writeStream.queryName("attr_diff")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-attrdiff").toString)
      .format("memory")
      .start()
    try {
      vIn.addData(side("view"): _*)
      cIn.addData(side("click"): _*)
      q.processAllAvailable()
      val streamed = spark.table("attr_diff")
        .select("user_id", "click_id", "view_id", "lag_sec")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val batch = graft.Registry.queryMap("q_event_attribution")(spark, dir)
        .select("user_id", "click_id", "view_id", "lag_sec")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("funnelStages batch execution matches the within-batch ordered semantics") {
    implicit val s = spark
    import spark.implicits._
    // one batch, shuffled input order: sort-by-sec inside the state fn
    // must recover view(10) -> click(20) -> purchase(30)
    val events = Seq((5L, "purchase", 30L), (5L, "view", 10L),
      (5L, "click", 20L), (5L, "click", 5L)).toDS()
    val out = EventStream.funnelStages(events, windowSec = 100L)
      .collect().map(f => (f.stage, f.sec)).sorted.toSeq
    assert(out == Seq((1, 10L), (2, 20L), (3, 30L)))
  }

  test("sessionPaths: cross-batch session continuation, gap close, and " +
    "the 8-event path cap as bounded state") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = EventStream.sessionPaths(input.toDS(), idleTimeout = None)
      .writeStream.queryName("paths_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-paths").toString)
      .format("memory")
      .start()
    try {
      // batch 1: user 1 opens a session (2 events); user 2 a 10-event
      // burst (path must cap at 8)
      input.addData(Seq((1L, 100L, 1L, "view"), (1L, 200L, 2L, "click")) ++
        (1L to 10L).map(i => (2L, 100L + i, 10L + i, s"e$i")): _*)
      q.processAllAvailable()
      // batch 2: user 1 continues within the gap, then a >30-min gap
      // opens a NEW session — the old one must emit closed with the
      // full cross-batch path
      input.addData((1L, 300L, 3L, "purchase"), (1L, 9999L, 4L, "view"))
      q.processAllAvailable()
      val rows = spark.table("paths_test")
        .as[(Long, Long, Long, String, Boolean)].collect().toSeq
      val u1Closed = rows.filter(r => r._1 == 1L && !r._5)
      assert(u1Closed.map(r => (r._2, r._3, r._4)) ==
        Seq((100L, 3L, "view>click>purchase")),
        s"cross-batch session must close with the full path: $rows")
      val u2 = rows.filter(r => r._1 == 2L && r._5).last
      assert(u2._3 == 10L &&
        u2._4 == (1 to 8).map(i => s"e$i").mkString(">"),
        s"path must cap at 8 of 10 events: $u2")
    } finally q.stop()
  }

  test("sessionPaths on one batch equals q_event_paths' top-k on real " +
    "data (the shared sessionization + path definitions)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val F = org.apache.spark.sql.functions
    val ev = graft.Tables.t(spark, dir, "events")
      .select(F.col("user_id"),
        graft.Tables.nanosToEpochSec(F.col("ts")).as("sec"),
        F.col("event_id"), F.col("event_type"))
      .as[(Long, Long, Long, String)].collect().toSeq
    val input = MemoryStream[(Long, Long, Long, String)]
    val q = EventStream.sessionPaths(input.toDS(), idleTimeout = None)
      .writeStream.queryName("paths_diff")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-pathsdiff").toString)
      .format("memory")
      .start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      // one micro-batch: every session emits exactly once (closed or
      // open snapshot) — reduce by the batch query's top-k tail
      val streamed = spark.table("paths_diff")
        .groupBy("path").agg(F.count(F.lit(1)).as("n_sessions"))
        .orderBy(F.col("n_sessions").desc, F.col("path").asc)
        .limit(20)
        .as[(String, Long)].collect().toSeq
      val batch = graft.Registry.queryMap("q_event_paths")(spark, dir)
        .as[(String, Long)].collect().toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("rollingRevenue: a day straddling micro-batches re-emits its " +
    "updated trailing values; a gap day SHRINKS the window") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = EventStream.rollingRevenue(input.toDS())
      .writeStream.queryName("roll_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-roll").toString)
      .format("memory")
      .start()
    try {
      // day 0: 10.5; day 1: 2.0 — then day 1 gains 3.0 in batch 2, and
      // day 5 (gap: days 2-4 empty) closes a shrunken 2-day window
      input.addData((10L, 10500000L), (86410L, 2000000L))
      q.processAllAvailable()
      input.addData((86420L, 3000000L), (5L * 86400L + 9L, 7000000L))
      q.processAllAvailable()
      val rows = spark.table("roll_test")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      // day 1 emitted twice: first (1 purchase, 2.0, trailing 12.5),
      // then re-emitted updated (2 purchases, 5.0, trailing 15.5)
      assert(rows.filter(_._1 == 1L).sortBy(_._2) ==
        Seq((1L, 1L, 2000000L, 12500000L, 2L),
          (1L, 2L, 5000000L, 15500000L, 2L)), rows.toString)
      // day 5's RANGE −6 window is [−1..5]: present days {0, 1, 5} all
      // qualify — sum 10.5+5.0+7.0 = 22.5 over a SHRUNKEN 3-day count
      // (the gap days 2–4 contribute nothing, exactly the batch
      // query's gap-day semantics)
      assert(rows.filter(_._1 == 5L) ==
        Seq((5L, 1L, 7000000L, 22500000L, 3L)), rows.toString)
      // lateness bound (r14 review): day 20 advances the horizon past
      // day 0; a later day-0 event must be DROPPED — re-entering would
      // emit a day-0 row with count/revenue RESET to the late batch,
      // regressing the correct figures already emitted
      input.addData((20L * 86400L + 3L, 1000000L))
      q.processAllAvailable()
      input.addData((30L, 9000000L)) // very-late day-0 purchase
      q.processAllAvailable()
      val after = spark.table("roll_test")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(after.count(_._1 == 0L) == rows.count(_._1 == 0L),
        "an evicted day must not re-emit on late data")
    } finally q.stop()
  }

  test("rollingRevenue: an in-horizon LATE day re-emits every standing " +
    "day whose trailing window contains it (r14 review: the late " +
    "revenue changes their rolling figures; freshest-row-wins must " +
    "not leave them stale)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = EventStream.rollingRevenue(input.toDS())
      .writeStream.queryName("roll_late")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-rolllate").toString)
      .format("memory")
      .start()
    try {
      input.addData((10L, 2000000L), (2L * 86400L + 5L, 3000000L))
      q.processAllAvailable()
      // late day-1 arrives inside the horizon: day 1 emits AND day 2
      // re-emits with the late revenue folded into its trailing sum
      input.addData((86400L + 7L, 10000000L))
      q.processAllAvailable()
      val rows = spark.table("roll_late")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(rows.contains((1L, 1L, 10000000L, 12000000L, 2L)), rows)
      val day2 = rows.filter(_._1 == 2L)
      assert(day2.head == ((2L, 1L, 3000000L, 5000000L, 2L)), rows)
      assert(day2.last == ((2L, 1L, 3000000L, 15000000L, 3L)),
        s"day 2 must re-emit with the late day-1 revenue: $rows")
    } finally q.stop()
  }

  test("rollingRevenue: a late in-horizon day whose OWN trailing window " +
    "reaches below the acceptance floor still re-emits with the FULL " +
    "sums — state retains 2w−1 days, so retention never truncates an " +
    "accepted day's window (r14 advice: w-day retention emitted " +
    "regressed rolling figures for exactly this shape)") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = EventStream.rollingRevenue(input.toDS())
      .writeStream.queryName("roll_retain")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-rollretain").toString)
      .format("memory")
      .start()
    try {
      // day 1: 1.0, day 8: 2.0 — under w-day retention day 1 would
      // evict here (floor 8−6 = 2); under 2w−1 it is retained as a
      // window input
      input.addData((86400L + 10L, 1000000L), (8L * 86400L + 10L, 2000000L))
      q.processAllAvailable()
      // late day 3 (>= acceptance floor 2): its window [−3..3] must
      // include day 1's revenue — the buggy retention emitted 5.0/1
      input.addData((3L * 86400L + 10L, 5000000L))
      q.processAllAvailable()
      val rows = spark.table("roll_retain")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(rows.filter(_._1 == 3L) ==
        Seq((3L, 1L, 5000000L, 6000000L, 2L)),
        s"day 3's window must include retained day 1: $rows")
      assert(rows.filter(_._1 == 8L).last ==
        ((8L, 1L, 2000000L, 7000000L, 2L)),
        s"day 8 re-emits with the late day-3 revenue: $rows")
      // eviction still bounds state: day 20 moves the retention floor
      // to 8; a very-late day-7 event (below acceptance floor 14) is
      // dropped, and day 14's window still reaches the retained day 8
      input.addData((20L * 86400L + 10L, 4000000L))
      q.processAllAvailable()
      input.addData((7L * 86400L + 10L, 9000000L), // dropped (< 14)
        (14L * 86400L + 10L, 3000000L))            // accepted
      q.processAllAvailable()
      val after = spark.table("roll_retain")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(after.count(_._1 == 7L) == 0,
        s"below the acceptance floor must drop: $after")
      assert(after.filter(_._1 == 14L) ==
        Seq((14L, 1L, 3000000L, 5000000L, 2L)),
        s"day 14's window [8..14] must include retained day 8: $after")
    } finally q.stop()
  }

  test("rollingRevenue on one batch equals q_event_rolling on real data") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val F = org.apache.spark.sql.functions
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    val ev = graft.Tables.t(spark, dir, "events")
      .filter(F.col("event_type") === "purchase")
      .select(graft.Tables.nanosToEpochSec(F.col("ts")).as("sec"),
        (F.col("value").cast(DecimalType(18, 6)) * 1000000)
          .cast(LongType).as("micros"))
      .as[(Long, Long)].collect().toSeq
    val input = MemoryStream[(Long, Long)]
    val q = EventStream.rollingRevenue(input.toDS())
      .writeStream.queryName("roll_diff")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-rolldiff").toString)
      .format("memory")
      .start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      // map micros back through the SAME decimal-cast/round tail as the
      // batch query so the doubles are computed identically
      val streamed = spark.table("roll_diff")
        .select(F.col("day"), F.col("nPurchases").as("n_purchases"),
          F.round((F.col("revMicros").cast(DecimalType(38, 6)) /
            1000000).cast(DoubleType), 6).as("revenue"),
          F.round((F.col("rev7Micros").cast(DecimalType(38, 6)) /
            1000000).cast(DoubleType), 6).as("revenue_7d"),
          F.round((F.col("rev7Micros").cast(DecimalType(38, 6)) /
            1000000).cast(DoubleType) / F.col("d7"), 6)
            .as("avg_daily_7d"))
        .as[(Long, Long, Double, Double, Double)]
        .collect().sortBy(_._1).toSeq
      val batch = graft.Registry.queryMap("q_event_rolling")(spark, dir)
        .as[(Long, Long, Double, Double, Double)]
        .collect().sortBy(_._1).toSeq
      assert(streamed.nonEmpty && streamed == batch)
    } finally q.stop()
  }
}
