package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the canonical "operator Spark lacks" (task
  * mandate; the reference has no joins at all, SURVEY.md §2-G).
  *
  * For each left row, attach the payload of the LAST right row with the
  * same keys and right.ts <= left.ts. Implemented Spark-first, composing
  * existing operators (preference order (a) of the custom-op ladder):
  * tag both sides, union, ONE shuffle on the keys, partition-local sort,
  * running `last(payload, ignoreNulls)` window, keep left rows.
  *
  * Scale: cost = one hash shuffle + one in-partition sort of |L|+|R| —
  * never the O(|L|x|R|) range-join explosion a naive
  * `join(l.key=r.key && r.ts<=l.ts)` + groupBy-max would produce; skewed
  * keys split cleanly because the window is ROWS UNBOUNDED PRECEDING
  * (AQE skew handling still applies to the shuffle).
  *
  * Determinism: ties on (ts) between right rows are broken by
  * `rightTiebreak` (max wins — it sorts last before the left row); a
  * right row at exactly left.ts COUNTS as "before" (right rows order
  * ahead of left rows at equal ts).
  */
object AsOfJoin {

  /** Shared skeleton: tag both sides, pad to a common schema, union.
    * Left rows carry `_side = 0` (sorting AFTER right rows at equal ts
    * under (_t asc, _side desc)), right rows `_side = 1` + `_tb` =
    * tiebreak. Returns (unioned, leftCols).
    */
  private def tagUnion(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: String,
      caller: String): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    val reserved = Seq("_t", "_side", "_tb", "_pay", "_pick", "_b", "_f")
    require((leftCols ++ right.columns).intersect(reserved).isEmpty,
      s"column names ${reserved.mkString("/")} are reserved by $caller")
    require(leftCols.intersect(payload).isEmpty,
      s"left side already has payload column(s) " +
        s"${leftCols.intersect(payload).mkString(", ")} — rename before joining " +
        "(padding would silently null them out)")
    val l = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(0)) // left sorts AFTER right at equal ts
      .withColumn("_tb", lit(null).cast(right.schema(rightTiebreak).dataType))
    val lPadded = payload.foldLeft(l)((df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType)))
    val r0 = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(1))
      .withColumn("_tb", col(rightTiebreak))
    val rPadded = leftCols.foldLeft(r0)((df, c) =>
      if (payload.contains(c) || keys.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val cols = keys.map(col) ++ Seq(col("_t"), col("_side"), col("_tb")) ++
      leftCols.filterNot(keys.contains).map(col) ++ payload.map(col)
    (lPadded.select(cols: _*).unionByName(rPadded.select(cols: _*)), leftCols)
  }

  /** The payload as ONE nullable struct: non-null exactly on right rows
    * (so `last/first(ignoreNulls)` windows skip left rows), carrying all
    * payload fields — including any that are genuinely NULL on the
    * matched right row. Taking last/first of the STRUCT makes the pick
    * atomic: one right row wins and every `asof_*` column comes from it.
    * Per-column windows would let a NULL field in the nearest right row
    * fall back to a FARTHER row for that column only — emitted columns
    * mixing values from different right rows.
    */
  private def payloadStruct(payload: Seq[String]): Column =
    when(col("_side") === 1, struct(payload.map(col): _*))

  def asOfBackward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: String): DataFrame = {
    val (unioned, leftCols) = tagUnion(left, right, keys, leftTs, rightTs,
      payload, rightTiebreak, "asOfBackward")
    // right rows first at equal _t (_side desc), ties by tiebreak asc so
    // the LARGEST tiebreak is the last-seen (deterministic winner).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPick = unioned.withColumn("_pick",
      last(payloadStruct(payload), ignoreNulls = true).over(w))
    withPick.filter(col("_side") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("_pick").getField(p).as(s"asof_$p"))): _*)
  }

  /** Forward as-of join: for each left row, the FIRST right row with the
    * same keys and right.ts >= left.ts (a right row at exactly left.ts
    * counts). Same union + one-shuffle + window skeleton as
    * [[asOfBackward]], scanning time DESCENDING so the running
    * `last(payload)` at a left row is the nearest at-or-after right row.
    * Ties on right ts resolve to the max `rightTiebreak` (same
    * convention as backward). Tolerance (pandas merge_asof style) is a
    * post-filter on the matched ts — callers include `rightTs` in
    * `payload` and null out matches beyond the bound.
    */
  def asOfForward(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: String): DataFrame = {
    val (unioned, leftCols) = tagUnion(left, right, keys, leftTs, rightTs,
      payload, rightTiebreak, "asOfForward")
    // DESCENDING time scan; right rows first at equal _t (_side desc) so
    // an exactly-simultaneous right row is visible to the left row.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").desc, col("_side").desc, col("_tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPick = unioned.withColumn("_pick",
      last(payloadStruct(payload), ignoreNulls = true).over(w))
    withPick.filter(col("_side") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("_pick").getField(p).as(s"asof_$p"))): _*)
  }

  /** Nearest as-of join (pandas merge_asof direction='nearest'): for
    * each left row, the right row with the same keys minimizing
    * |right.ts - left.ts|; exact ties in distance resolve BACKWARD (the
    * at-or-before match wins, delta 0 included).
    *
    * ONE shuffle + ONE partition sort: both directions are computed in a
    * single ascending window pass — the backward candidate as a running
    * `last(payload)` over [unbounded preceding, current] and the forward
    * candidate as `first(payload)` over [current, unbounded following];
    * same partitioning and ordering, so Spark evaluates both frames in
    * one WindowExec. The per-row pick compares the two candidates' ts
    * distances at full timestamp precision.
    *
    * Tie conventions (a consequence of the single sort order): among
    * right rows at one ts, the backward candidate is the MAX
    * `rightTiebreak` (it sorts last before the left row) while the
    * forward candidate is the MIN (first after); a right row at exactly
    * left.ts is matched via the backward side with distance 0. Returns
    * leftCols + `asof_<payload>` (+ nothing else).
    */
  def asOfNearest(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String,
      payload: Seq[String], rightTiebreak: String): DataFrame = {
    // rightTs rides along internally so the pick can compare distances
    val pay = (payload :+ rightTs).distinct
    val (unioned, leftCols) = tagUnion(left, right, keys, leftTs, rightTs,
      pay, rightTiebreak, "asOfNearest")
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc, col("_side").desc, col("_tb").asc_nulls_first)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // One struct per direction: each candidate is an ATOMIC right row
    // (see payloadStruct) — rightTs rides inside, so the distance
    // compared is the distance of the row the payload came from. The
    // struct is materialized ONCE as `_pay` and both frames reference
    // that attribute: windowing two fresh copies of the expression makes
    // ExtractWindowExpressions project each copy separately, splitting
    // the plan into two WindowExec nodes (one partition sort each).
    val both = unioned
      .withColumn("_pay", payloadStruct(pay))
      .withColumn("_b", last(col("_pay"), ignoreNulls = true).over(wb))
      .withColumn("_f", first(col("_pay"), ignoreNulls = true).over(wf))
    val bT = col("_b").getField(rightTs)
    val fT = col("_f").getField(rightTs)
    val useB = bT.isNotNull &&
      (fT.isNull || (col("_t") - bT) <= (fT - col("_t")))
    val picked = both.withColumn("_pick", when(useB, col("_b")).otherwise(col("_f")))
    picked.filter(col("_side") === 0)
      .select((leftCols.map(col) ++
        payload.map(p => col("_pick").getField(p).as(s"asof_$p"))): _*)
  }

  // ------------------------------------------------------------------
  // Declared query: purchase -> most recent prior click, per user.
  // The DuckDB twin uses the same union+window formulation (equivalent
  // to DuckDB's `ASOF LEFT JOIN` but with EXPLICIT tie semantics: equal
  // nanosecond timestamps resolve to the max click event_id).
  // ------------------------------------------------------------------
  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_asof_join",
      "Backward as-of join (purchase attribution): each purchase event " +
        "joins the same user's latest click with click.ts <= purchase.ts. " +
        "One shuffle + partition sort — no range-join explosion.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("p_tns"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_tns"),
            col("event_id").as("click_id"))
        asOfBackward(purchases, clicks, Seq("user_id"),
          leftTs = "p_tns", rightTs = "c_tns",
          payload = Seq("click_id", "c_tns"), rightTiebreak = "click_id")
          .select(col("purchase_id"), col("user_id"),
            Tables.nanosToEpochSec(col("p_tns")).as("p_sec"),
            col("asof_click_id").as("click_id"),
            (Tables.nanosToEpochSec(col("p_tns")) -
              Tables.nanosToEpochSec(col("asof_c_tns"))).as("gap_sec"))
          .orderBy("purchase_id")
      },
      // Oracle epoch seconds use FLOOR division (subtract the floor-mod
      // remainder, then exact //): DuckDB's bare `t // 1e9` truncates
      // toward zero and would diverge from Tables.nanosToEpochSec's
      // floor for pre-1970 timestamps.
      Some("""WITH u AS (
             |  SELECT user_id, epoch_ns(ts) AS t, 0 AS side, event_id AS purchase_id,
             |         NULL::BIGINT AS click_id
             |  FROM events WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, epoch_ns(ts) AS t, 1 AS side, NULL, event_id
             |  FROM events WHERE event_type = 'click'),
             |w AS (
             |  SELECT *,
             |    last_value(click_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, click_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS asof_click_id,
             |    last_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, click_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS asof_t
             |  FROM u)
             |SELECT purchase_id, user_id,
             |  ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) AS p_sec,
             |  asof_click_id AS click_id,
             |  ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) - ((asof_t - ((asof_t % 1000000000) + 1000000000) % 1000000000) // 1000000000) AS gap_sec
             |FROM w WHERE side = 0 ORDER BY purchase_id""".stripMargin)
    ),

    QueryDef(
      "q_asof_forward",
      "Forward as-of join with tolerance (time-to-conversion): each " +
        "click joins the same user's NEXT purchase with purchase.ts >= " +
        "click.ts, nulled when the wait exceeds 1 day (merge_asof " +
        "tolerance). Same one-shuffle union+window skeleton, time " +
        "scanned descending.",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("c_tns"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_tns"),
            col("event_id").as("purchase_id"))
        val tol = 86400L
        val raw = asOfForward(clicks, purchases, Seq("user_id"),
          leftTs = "c_tns", rightTs = "p_tns",
          payload = Seq("purchase_id", "p_tns"), rightTiebreak = "purchase_id")
        val gap = Tables.nanosToEpochSec(col("asof_p_tns")) -
          Tables.nanosToEpochSec(col("c_tns"))
        raw.select(col("click_id"), col("user_id"),
            Tables.nanosToEpochSec(col("c_tns")).as("c_sec"),
            when(gap <= tol, col("asof_purchase_id")).as("purchase_id"),
            when(gap <= tol, gap).as("wait_sec"))
          .orderBy("click_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, epoch_ns(ts) AS t, 0 AS side, event_id AS click_id,
             |         NULL::BIGINT AS purchase_id
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, epoch_ns(ts) AS t, 1 AS side, NULL, event_id
             |  FROM events WHERE event_type = 'purchase'),
             |w AS (
             |  SELECT *,
             |    last_value(purchase_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t DESC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS asof_purchase_id,
             |    last_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t DESC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS asof_t
             |  FROM u),
             |g AS (
             |  SELECT *, ((asof_t - ((asof_t % 1000000000) + 1000000000) % 1000000000) // 1000000000) - ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) AS gap
             |  FROM w WHERE side = 0)
             |SELECT click_id, user_id, ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) AS c_sec,
             |  CASE WHEN gap <= 86400 THEN asof_purchase_id END AS purchase_id,
             |  CASE WHEN gap <= 86400 THEN gap END AS wait_sec
             |FROM g ORDER BY click_id""".stripMargin)
    ),

    QueryDef(
      "q_asof_nearest",
      "Nearest as-of join (merge_asof direction='nearest'): each click " +
        "joins the same user's closest purchase in time, either " +
        "direction, distance ties resolving backward. BOTH direction " +
        "candidates come from ONE ascending window pass (running last " +
        "for backward, first-over-following for forward — same sort, " +
        "one WindowExec), so the cost stays one shuffle + one " +
        "partition sort; gap_sec is signed (negative = purchase " +
        "before click).",
      (s, dir) => {
        val ev = Tables.t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts").as("c_tns"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_tns"),
            col("event_id").as("purchase_id"))
        asOfNearest(clicks, purchases, Seq("user_id"),
          leftTs = "c_tns", rightTs = "p_tns",
          payload = Seq("purchase_id", "p_tns"), rightTiebreak = "purchase_id")
          .select(col("click_id"), col("user_id"),
            Tables.nanosToEpochSec(col("c_tns")).as("c_sec"),
            col("asof_purchase_id").as("purchase_id"),
            (Tables.nanosToEpochSec(col("asof_p_tns")) -
              Tables.nanosToEpochSec(col("c_tns"))).as("gap_sec"))
          .orderBy("click_id")
      },
      Some("""WITH u AS (
             |  SELECT user_id, epoch_ns(ts) AS t, 0 AS side, event_id AS click_id,
             |         NULL::BIGINT AS purchase_id
             |  FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id, epoch_ns(ts) AS t, 1 AS side, NULL, event_id
             |  FROM events WHERE event_type = 'purchase'),
             |w AS (
             |  SELECT *,
             |    last_value(purchase_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS b_id,
             |    last_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS UNBOUNDED PRECEDING) AS b_t,
             |    first_value(purchase_id IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id,
             |    first_value(CASE WHEN side = 1 THEN t END IGNORE NULLS) OVER (
             |      PARTITION BY user_id
             |      ORDER BY t ASC, side DESC, purchase_id ASC NULLS FIRST
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_t
             |  FROM u),
             |p AS (
             |  SELECT *, (b_t IS NOT NULL AND (f_t IS NULL OR t - b_t <= f_t - t))
             |    AS use_b
             |  FROM w WHERE side = 0)
             |SELECT click_id, user_id, ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) AS c_sec,
             |  CASE WHEN use_b THEN b_id ELSE f_id END AS purchase_id,
             |  CASE WHEN use_b THEN ((b_t - ((b_t % 1000000000) + 1000000000) % 1000000000) // 1000000000) - ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000)
             |       ELSE ((f_t - ((f_t % 1000000000) + 1000000000) % 1000000000) // 1000000000) - ((t - ((t % 1000000000) + 1000000000) % 1000000000) // 1000000000) END AS gap_sec
             |FROM p ORDER BY click_id""".stripMargin)
    )
  )
}
