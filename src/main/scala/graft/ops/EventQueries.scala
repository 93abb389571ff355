package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-table operators (SURVEY.md §2 H5/H6): event-time tumbling-window
  * aggregation (batch twin of the Structured Streaming query in
  * [[graft.streaming.EventStream]]), JSON prop extraction, and
  * lag-based sessionization.
  *
  * events.ts is parquet TIMESTAMP(NANOS) read as Long nanos (Spark has no
  * ns type); all time arithmetic is exact integer math on epoch seconds so
  * the DuckDB oracle (which reads true ns timestamps) agrees bit-for-bit.
  */
object EventQueries {

  private def epochSec = Tables.nanosToEpochSec(col("ts"))

  /** Funnel step conversion window (1 day). */
  private val FunnelWindowSec = 86400L

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_event_window",
      "Tumbling 1-hour event-time window per event_type — the batch form " +
        "of groupBy(window($\"ts\", \"1 hour\")); streaming-ready with " +
        "withWatermark (graft.streaming.EventStream).",
      (s, dir) => {
        Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          // floor-mod, not %: Spark's % truncates toward zero, so a
          // negative (pre-1970) epoch second would round UP while the
          // oracle's date_trunc floors — keep both flooring.
          .withColumn("window_start",
            col("sec") - ((col("sec") % 3600 + 3600) % 3600))
          .groupBy("window_start", "event_type")
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
              .as("sum_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("window_start", "event_type")
      },
      Some("""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
             |  event_type, COUNT(*) AS n_events,
             |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
             |  COUNT(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    QueryDef(
      "q_json_extract",
      "Multimodal JSON prop column (H5): get_json_object over events.props " +
        "+ typed extraction and per-key aggregate.",
      (s, dir) => {
        Tables.t(s, dir, "events")
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").as("k_str"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"))
          .withColumn("k_bucket", col("k_int") % 10)
          .orderBy("event_id")
          .limit(1000)
      },
      // Cast parity: Spark's non-ANSI string->int cast yields NULL for
      // anything non-integral ("abc" AND "12.5"); DuckDB's CAST errors
      // on "abc" and ROUNDS "12.5" to 13. Gate on an integral-literal
      // regex so both engines agree on every representable input.
      Some("""WITH j AS (SELECT event_id,
             |    json_extract_string(props, '$.k') AS k_str FROM events),
             |t AS (SELECT event_id, k_str,
             |    CASE WHEN regexp_matches(trim(k_str), '^[+-]?[0-9]+$')
             |      THEN CAST(trim(k_str) AS INT) END AS k_int
             |  FROM j)
             |SELECT event_id, k_str, k_int, k_int % 10 AS k_bucket
             |FROM t ORDER BY event_id LIMIT 1000""".stripMargin)
    ),

    QueryDef(
      "q_event_sessionize",
      "Sessionization (30-min inactivity gap) via lag + running sum — the " +
        "batch twin of flatMapGroupsWithState session tracking; exact " +
        "integer epoch-second arithmetic.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("sec"), col("event_id"))
        Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_sec").isNull ||
              col("sec") - col("prev_sec") > 1800, 1).otherwise(0))
          .withColumn("session_idx",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("sec")).as("session_start"),
            max(col("sec")).as("session_end"))
          .orderBy("user_id", "session_idx")
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_id,
             |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec
             |  FROM events
             |), flagged AS (
             |  SELECT user_id, event_id, sec,
             |    CASE WHEN lag(sec) OVER w IS NULL
             |           OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END AS new_session
             |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
             |), sessions AS (
             |  SELECT user_id, sec,
             |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM flagged
             |)
             |SELECT user_id, session_idx, COUNT(*) AS n_events,
             |  MIN(sec) AS session_start, MAX(sec) AS session_end
             |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    QueryDef(
      "q_event_paths",
      "Top-k session paths (the sequence-mining view of the event log — " +
        "the table a product review reads to see HOW users move): per " +
        "session (the SAME 30-min-gap sessionization as " +
        "q_event_sessionize — shared lag+running-sum definition, " +
        "(sec, event_id) order), the ordered event-type path string " +
        "capped at the first 8 events (the classic path-explosion " +
        "guard: distinct paths grow exponentially in length, so the " +
        "grouping key is BOUNDED by construction), counted across " +
        "sessions; top 20 paths by (sessions desc, path asc). Shape: " +
        "the sessionize window pass, one groupBy on the bounded path " +
        "string, TakeOrdered top-k — no vocab-wide window, nothing " +
        "wider than (user, session, 8 event types) ever shuffles.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("sec"), col("event_id"))
        val sess = Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_sec").isNull ||
              col("sec") - col("prev_sec") > 1800, 1).otherwise(0))
          .withColumn("session_idx",
            sum(col("new_session")).over(byUser.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)))
        sess.groupBy("user_id", "session_idx")
          .agg(concat_ws(">", slice(transform(array_sort(collect_list(
            struct(col("sec"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), 1, 8)).as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path").asc)
          .limit(20)
      },
      Some("""WITH t AS (
             |  SELECT user_id, event_id, event_type,
             |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec
             |  FROM events
             |), flagged AS (
             |  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
             |      OR sec - lag(sec) OVER w > 1800 THEN 1 ELSE 0 END
             |    AS new_session
             |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
             |), sessions AS (
             |  SELECT user_id, event_type, sec, event_id,
             |    CAST(SUM(new_session) OVER (PARTITION BY user_id
             |      ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS session_idx
             |  FROM flagged
             |), paths AS (
             |  SELECT user_id, session_idx,
             |    array_to_string(
             |      (list(event_type ORDER BY sec, event_id, event_type))[1:8],
             |      '>') AS path
             |  FROM sessions GROUP BY 1, 2
             |)
             |SELECT path, COUNT(*) AS n_sessions
             |FROM paths GROUP BY path
             |ORDER BY n_sessions DESC, path ASC LIMIT 20""".stripMargin)
    ),

    QueryDef(
      "q_event_funnel",
      "Ordered conversion funnel view -> click -> purchase with a 1-day " +
        "conversion window per step: first view, first click strictly " +
        "after it (within the window), first purchase strictly after " +
        "that. Per-stage user counts; each step is a user-keyed " +
        "equi-join of aggregates over a monotonically SHRINKING stage " +
        "relation, so at 100 TB the expensive joins run on converters " +
        "only, never the full event log.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          .select("user_id", "event_type", "sec")
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("sec")).as("v_sec"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("sec") > col("v_sec") &&
            col("sec") <= col("v_sec") + FunnelWindowSec)
          .groupBy("user_id").agg(min(col("sec")).as("c_sec"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("sec") > col("c_sec") &&
            col("sec") <= col("c_sec") + FunnelWindowSec)
          .groupBy("user_id").agg(min(col("sec")).as("p_sec"))
        Seq("1_view" -> v, "2_click_after_view" -> c,
          "3_purchase_after_click" -> p)
          .map { case (nm, df) =>
            df.agg(count(lit(1)).as("n_users"))
              .select(lit(nm).as("stage"), col("n_users"))
          }
          .reduce(_.union(_))
          .orderBy("stage")
      },
      Some(s"""WITH e AS (SELECT user_id, event_type,
              |    CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec
              |  FROM events),
              |v AS (SELECT user_id, min(sec) AS v_sec FROM e
              |  WHERE event_type = 'view' GROUP BY 1),
              |c AS (SELECT e.user_id, min(sec) AS c_sec FROM e JOIN v USING(user_id)
              |  WHERE event_type = 'click' AND sec > v_sec
              |    AND sec <= v_sec + $FunnelWindowSec GROUP BY 1),
              |p AS (SELECT e.user_id, min(sec) AS p_sec FROM e JOIN c USING(user_id)
              |  WHERE event_type = 'purchase' AND sec > c_sec
              |    AND sec <= c_sec + $FunnelWindowSec GROUP BY 1)
              |SELECT stage, n_users FROM (
              |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
              |  UNION ALL SELECT '2_click_after_view', count(*) FROM c
              |  UNION ALL SELECT '3_purchase_after_click', count(*) FROM p)
              |ORDER BY stage""".stripMargin)
    ),

    QueryDef(
      "q_event_retention",
      "Daily cohort retention: cohort = a user's first active epoch-day; " +
        "one row per (cohort_day, day_offset) counting active users. " +
        "Distinct (user, day) first — the activity relation is bounded " +
        "by users x days, not by raw events — then one user-keyed min " +
        "and a user-keyed join; all integer epoch-day arithmetic.",
      (s, dir) => {
        val act = Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          .select(col("user_id"), expr("sec div 86400").as("day"))
          .distinct()
        val coh = act.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        act.join(coh, "user_id")
          .groupBy(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count(lit(1)).as("n_active_users"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id,
             |    (CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) // 86400) AS day
             |  FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1)
             |SELECT cohort_day, day - cohort_day AS day_offset,
             |  count(*) AS n_active_users
             |FROM e JOIN c USING(user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    ),

    QueryDef(
      "q_event_rolling",
      "Trailing 7-day rolling revenue (the BI-staple moving average, " +
        "and the third RANGE-frame face next to q_event_anomaly's " +
        "trailing baseline): per epoch-day, purchase count, that day's " +
        "revenue, and the 7-day trailing revenue sum + average — RANGE " +
        "BETWEEN 6 PRECEDING on the integer day, so a GAP day shrinks " +
        "the window instead of silently reaching further back (the " +
        "ROWS-frame hazard on sparse series). Shape: the corpus " +
        "reduces to one day-grain aggregate (days are bounded — a " +
        "decade is ~3 653 rows at ANY corpus scale), and the rolling " +
        "window runs on that tiny relation; revenue sums are " +
        "DECIMAL-exact (the q_event_window convention), the average " +
        "one IEEE division of exact operands rounded 6dp.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .withColumn("sec", epochSec)
          .select(expr("sec div 86400").as("day"), col("value"))
          .groupBy("day")
          .agg(count(lit(1)).as("n_purchases"),
            sum(col("value").cast(DecimalType(18, 6))).as("rev"))
        val w = Window.orderBy("day").rangeBetween(-6, 0)
        daily
          .withColumn("rev7", sum(col("rev")).over(w))
          .withColumn("d7", count(lit(1)).over(w))
          .select(col("day"), col("n_purchases"),
            round(col("rev").cast(DoubleType), 6).as("revenue"),
            round(col("rev7").cast(DoubleType), 6).as("revenue_7d"),
            round(col("rev7").cast(DoubleType) / col("d7"), 6)
              .as("avg_daily_7d"))
          .orderBy("day")
      },
      Some("""WITH d AS (SELECT
             |    (CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)
             |      // 86400) AS day,
             |    COUNT(*) AS n_purchases,
             |    SUM(CAST(value AS DECIMAL(18,6))) AS rev
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |r AS (SELECT day, n_purchases, rev,
             |    SUM(rev) OVER (ORDER BY day
             |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rev7,
             |    COUNT(*) OVER (ORDER BY day
             |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS d7
             |  FROM d)
             |SELECT day, n_purchases,
             |  round(CAST(rev AS DOUBLE), 6) AS revenue,
             |  round(CAST(rev7 AS DOUBLE), 6) AS revenue_7d,
             |  round(CAST(rev7 AS DOUBLE) / d7, 6) AS avg_daily_7d
             |FROM r ORDER BY day""".stripMargin)
    ),

    QueryDef(
      "q_event_anomaly",
      "Event-rate anomaly detection: per-(type, minute) counts scored " +
        "against a trailing 30-minute baseline via a RANGE window frame " +
        "(value-based bounds — a gap in minutes shrinks the baseline " +
        "set instead of silently reaching further back, which a ROWS " +
        "frame would do on sparse series); a minute is anomalous at " +
        ">= 3x lift. Shape: one minute-grain agg shuffle + one " +
        "event_type window partition — time-ordered state bounded by " +
        "the frame, the monitoring-query shape a streaming deployment " +
        "runs with watermarked windows. Baseline averages PRESENT " +
        "minutes only (sparse semantics, identical in the oracle); " +
        "exact integer sums under the one IEEE division keep it " +
        "deterministic at any parallelism.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val m = Tables.t(s, dir, "events")
          .withColumn("sec", epochSec)
          .withColumn("minute",
            col("sec") - ((col("sec") % 60 + 60) % 60))
          .groupBy("event_type", "minute")
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("event_type").orderBy("minute")
          .rangeBetween(-1800, -60)
        m.withColumn("baseline", avg(col("cnt")).over(w))
          .select(col("event_type"), col("minute"), col("cnt"),
            round(col("baseline"), 6).as("baseline"),
            when(col("baseline") > 0,
              round(col("cnt") / col("baseline"), 6)).as("lift"),
            when(col("baseline") > 0 && col("cnt") / col("baseline") >= 3.0,
              1).otherwise(0).as("anomalous"))
          .orderBy("event_type", "minute")
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute
             |  FROM events),
             |m AS (SELECT event_type, minute, count(*) AS cnt
             |  FROM e GROUP BY 1, 2),
             |w AS (SELECT *, avg(cnt) OVER (PARTITION BY event_type
             |    ORDER BY minute
             |    RANGE BETWEEN 1800 PRECEDING AND 60 PRECEDING) AS baseline
             |  FROM m)
             |SELECT event_type, minute, cnt,
             |  round(baseline, 6) AS baseline,
             |  CASE WHEN baseline > 0 THEN round(cnt/baseline, 6) END AS lift,
             |  CASE WHEN baseline > 0 AND cnt/baseline >= 3 THEN 1 ELSE 0 END
             |    AS anomalous
             |FROM w ORDER BY event_type, minute""".stripMargin)
    ),

    QueryDef(
      "q_event_attribution",
      "Marketing attribution, the batch twin of the BOUNDED " +
        "stream-stream join (EventStream.attributionJoin): every click " +
        "matched to the same user's views in the 30 minutes before it " +
        "(inclusive), with the seconds of lag and a last-touch flag " +
        "(most recent view wins; view_id tiebreak). The flag makes one " +
        "query serve both attribution models — all-touch rows AND the " +
        "last-touch subset (is_last_touch = 1, the as-of-backward " +
        "semantics of H7). Shape: user-keyed equi-join (both sides " +
        "shuffle on user_id, the time bound filters pairs), then one " +
        "click-keyed window over the already-bounded pair set — " +
        "per-user fan-out is view-rate x 30 min at any scale, the same " +
        "bound the streaming state store relies on.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events").withColumn("sec", epochSec)
        val v = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_id"),
            col("sec").as("vsec"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("sec").as("csec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("click_id")
          .orderBy(col("vsec").desc, col("view_id").asc)
        c.join(v, Seq("user_id"))
          .filter(col("vsec") <= col("csec") &&
            col("vsec") >= col("csec") - 1800)
          .withColumn("rn", row_number().over(w))
          .select(col("user_id"), col("click_id"), col("view_id"),
            (col("csec") - col("vsec")).as("lag_sec"),
            when(col("rn") === 1, 1).otherwise(0).as("is_last_touch"))
          .orderBy("click_id", "view_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
             |v AS (SELECT user_id, event_id AS view_id, sec AS vsec
             |  FROM e WHERE event_type = 'view'),
             |c AS (SELECT user_id, event_id AS click_id, sec AS csec
             |  FROM e WHERE event_type = 'click'),
             |j AS (SELECT c.user_id, c.click_id, v.view_id,
             |    c.csec - v.vsec AS lag_sec,
             |    ROW_NUMBER() OVER (PARTITION BY c.click_id
             |      ORDER BY v.vsec DESC, v.view_id ASC) AS rn
             |  FROM c JOIN v ON c.user_id = v.user_id
             |    AND v.vsec <= c.csec AND v.vsec >= c.csec - 1800)
             |SELECT user_id, click_id, view_id, lag_sec,
             |  CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_last_touch
             |FROM j ORDER BY click_id, view_id""".stripMargin)
    )
  )
}
