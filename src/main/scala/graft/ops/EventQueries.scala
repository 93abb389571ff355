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
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_str,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
             |FROM events ORDER BY event_id LIMIT 1000""".stripMargin)
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
    )
  )
}
