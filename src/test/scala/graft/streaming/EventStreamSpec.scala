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
}
