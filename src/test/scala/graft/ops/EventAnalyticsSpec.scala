package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Funnel + retention semantics on a controlled event log. The declared
  * queries read `events.parquet` with ts as INT64 nanos (the testdata's
  * TIMESTAMP(NANOS) arrives that way under nanosAsLong), so the fixture
  * writes Long nanos directly.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400L
  private def ns(sec: Long): Long = sec * 1000000000L
  private val t0 = Day * 100 // clean day boundary

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val d = Files.createTempDirectory("eventspec").toString
    rows.zipWithIndex
      .map { case ((uid, sec, _, tpe), i) =>
        (i.toLong, ns(sec), uid, tpe, 1.0, """{"k":"1"}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q_event_funnel: windowed ordered stages, wrong order / late click excluded") {
    val dir = writeEvents(Seq(
      // user 1: view -> click(+100s) -> purchase(+200s): full conversion
      (1L, t0, 0L, "view"), (1L, t0 + 100, 0L, "click"),
      (1L, t0 + 200, 0L, "purchase"),
      // user 2: click 2 days after view -> outside the 1-day window
      (2L, t0, 0L, "view"), (2L, t0 + 2 * Day, 0L, "click"),
      // user 3: click BEFORE view -> no click strictly after the view
      (3L, t0 + 100, 0L, "view"), (3L, t0, 0L, "click"),
      // user 4: never views -> not in the funnel at all
      (4L, t0, 0L, "click"), (4L, t0 + 100, 0L, "purchase")))
    val got = Registry.queryMap("q_event_funnel")(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_view", 3L), ("2_click_after_view", 1L),
      ("3_purchase_after_click", 1L)))
  }

  test("differential: funnel stage counts match brute force on a random log") {
    val rnd = new scala.util.Random(11)
    val types = Vector("view", "click", "purchase", "error")
    val rows = (1 to 600).map { _ =>
      val uid = rnd.nextInt(25).toLong
      // spread over ~3 days so the 1-day window both admits and rejects
      (uid, t0 + rnd.nextInt(3 * Day.toInt), 0L, types(rnd.nextInt(types.size)))
    }
    val dir = writeEvents(rows)

    // brute force mirror of the declared semantics
    val byUser = rows.groupBy(_._1)
    var (s1, s2, s3) = (0, 0, 0)
    byUser.foreach { case (_, evs) =>
      val vs = evs.filter(_._4 == "view").map(_._2)
      if (vs.nonEmpty) {
        s1 += 1
        val v = vs.min
        val cs = evs.filter(e => e._4 == "click" && e._2 > v && e._2 <= v + Day)
          .map(_._2)
        if (cs.nonEmpty) {
          s2 += 1
          val c = cs.min
          if (evs.exists(e =>
              e._4 == "purchase" && e._2 > c && e._2 <= c + Day)) s3 += 1
        }
      }
    }
    val got = Registry.queryMap("q_event_funnel")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1_view" -> s1.toLong,
      "2_click_after_view" -> s2.toLong, "3_purchase_after_click" -> s3.toLong))
  }

  test("q_event_retention: day offsets counted against each user's first day") {
    val dir = writeEvents(Seq(
      // cohort day 100: user 1 active days 100,101; user 2 days 100,102
      (1L, t0 + 10, 0L, "view"), (1L, t0 + Day + 10, 0L, "view"),
      (2L, t0 + 20, 0L, "view"), (2L, t0 + 2 * Day + 20, 0L, "view"),
      // two events same day -> ONE active (user, day)
      (2L, t0 + 30, 0L, "click"),
      // cohort day 101: user 3 active day 101 only
      (3L, t0 + Day + 5, 0L, "view")))
    val got = Registry.queryMap("q_event_retention")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((100L, 0L, 2L), (100L, 1L, 1L), (100L, 2L, 1L),
      (101L, 0L, 1L)))
  }

  test("q_event_paths: session boundaries split paths, order is by " +
    "(sec, event_id), the 8-event cap truncates, counts aggregate " +
    "across users") {
    val dir = writeEvents(Seq(
      // users 1 and 2: identical view>click>purchase sessions -> count 2
      (1L, t0, 0L, "view"), (1L, t0 + 10, 0L, "click"),
      (1L, t0 + 20, 0L, "purchase"),
      (2L, t0, 0L, "view"), (2L, t0 + 10, 0L, "click"),
      (2L, t0 + 20, 0L, "purchase"),
      // user 3: a 31-min gap splits into view | click (two sessions)
      (3L, t0, 0L, "view"), (3L, t0 + 1860, 0L, "click"),
      // user 4: 10 events in one session -> path capped at the first 8
      (4L, t0, 0L, "view")) ++
      (1 to 9).map(i => (4L, t0 + i.toLong, 0L, "click")))
    val got = Registry.queryMap("q_event_paths")(spark, dir)
      .as[(String, Long)].collect().toSeq
    val capped = "view" + ">click" * 7
    assert(got == Seq(("view>click>purchase", 2L), ("click", 1L),
      ("view", 1L), (capped, 1L)), got)
  }

  test("q_event_rolling: the RANGE frame shrinks over gap days instead " +
    "of reaching back (the ROWS hazard), sums are day-exact") {
    // purchases of value 1.0 each: days 100 (x2), 101, 102, and 110
    // after a 7-day gap — day 110's window must contain ONLY day 110.
    val dir = writeEvents(Seq(
      (1L, 100 * Day + 10, 0L, "purchase"),
      (2L, 100 * Day + 20, 0L, "purchase"),
      (3L, 101 * Day + 10, 0L, "purchase"),
      (4L, 102 * Day + 10, 0L, "purchase"),
      (5L, 110 * Day + 10, 0L, "purchase"),
      // non-purchase noise must not count
      (6L, 100 * Day + 30, 0L, "view")))
    val got = Registry.queryMap("q_event_rolling")(spark, dir)
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (100L, 2L, 2.0, 2.0, 2.0),
      (101L, 1L, 1.0, 3.0, 1.5),
      (102L, 1L, 1.0, 4.0, math.rint(4.0 / 3 * 1e6) / 1e6),
      (110L, 1L, 1.0, 1.0, 1.0)), got)
  }
}
