package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join-shape coverage beyond the FK anti-join and equi-join aggregate
  * (SURVEY.md §2-G joins): semi-join (EXISTS), bucketed range join, and a
  * salted skew join. The reference (seanharr11/etlalchemy,
  * ETLAlchemySource.py::add_fks) only moves FK *metadata*; these prove the
  * Spark mappings a query user needs.
  */
object JoinQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** range-join window (seconds) — also the bucket width. */
  private val WindowSec = 300L

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_semi_join",
      "EXISTS semantics via left-semi join: customers with at least one " +
        "urgent high-value order. Semi joins never duplicate or widen the " +
        "left side — at scale the filtered orders side stays a build-side " +
        "hash relation (broadcast here), and no de-dup pass is needed " +
        "afterwards, unlike an inner-join + distinct formulation.",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val o = Tables.t(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > 150000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_orderpriority = '1-URGENT'
             |    AND o.o_totalprice > 150000.0)
             |ORDER BY c_custkey""".stripMargin)
    ),

    QueryDef(
      "q_range_join",
      s"Interval self-join decomposed into a bucket equi-join " +
        s"(graft.ops.RangeJoin): pairs of same-user events within " +
        s"$WindowSec s of each other. The naive |t1-t2|<=w predicate is a " +
        "cartesian/BNL plan; quantizing time into width-w buckets turns it " +
        "into a sort-merge equi-join on (user, bucket) with a 3x probe " +
        "fan-out and an exact post-filter — O(n) shuffle at any scale.",
      (s, dir) => {
        val e = Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            Tables.nanosToEpochSec(col("ts")).as("sec"))
        RangeJoin.selfPairsWithin(e, "user_id", "sec", "event_id", WindowSec)
          .select(col("user_id"), col("id_a").as("event_a"),
            col("id_b").as("event_b"), col("gap").as("gap_sec"))
          .orderBy("user_id", "event_a", "event_b")
      },
      Some(s"""WITH e AS (SELECT event_id, user_id,
              |  CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) AS sec
              |  FROM events)
              |SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
              |  abs(a.sec - b.sec) AS gap_sec
              |FROM e a JOIN e b ON a.user_id = b.user_id
              |  AND a.event_id < b.event_id
              |  AND abs(a.sec - b.sec) <= $WindowSec
              |ORDER BY a.user_id, event_a, event_b""".stripMargin)
    ),

    QueryDef(
      "q_skew_join",
      "Salted equi-join (graft.ops.Skew.saltedJoin): lineitem x supplier " +
        "on suppkey with the hot side salted across 8 sub-keys and the " +
        "small side replicated per salt. Result-identical to the plain " +
        "join (the oracle IS the plain join); the salt only changes row " +
        "placement. At bench scale supplier broadcasts and the salt is " +
        "inert; at 100 TB with both sides shuffling it caps the largest " +
        "reducer partition at hot-key-size/8.",
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_quantity"))
        val sup = Tables.t(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        Skew.saltedJoin(l, sup, "l_suppkey", salts = 8)
          .groupBy("l_suppkey", "s_name")
          .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, s_name, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY l_suppkey, s_name
             |ORDER BY l_suppkey""".stripMargin)
    ),

    QueryDef(
      "q_skew_profile",
      "Shuffle-key skew diagnostic — the measurement you run BEFORE " +
        "choosing a salt factor (q_skew_join) or trusting AQE: per-key " +
        "row counts over the join key reduced to the numbers that decide " +
        "the mitigation — key cardinality, max key weight, rank-exact " +
        "p50/p90/p99 of the count distribution, skew factor " +
        "(max/mean), and the hottest key. Scale shape: the only " +
        "corpus-scale shuffle is the per-key count agg (map-side " +
        "partial); percentiles are then taken over the COUNT-VALUE " +
        "frequency relation (distinct count values — a few hundred rows " +
        "under any Zipfian real-world distribution, vs billions of " +
        "keys), so the rank selection never needs a global sort of the " +
        "key relation. Rank = ceil(q*n_keys) in pure integer arithmetic " +
        "((n*q+99) div 100) so both engines pick the identical row; the " +
        "skew ratio is one IEEE division of exact integers, rounded 6dp.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val c = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("cnt"))
        val tot = c.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
          max(col("cnt")).as("max_cnt"))
        val top1 = c.orderBy(col("cnt").desc, col("k").asc).limit(1)
          .select(col("k").as("top1_key"), col("cnt").as("top1_cnt"))
        // count-value frequency relation: tiny at any scale (Zipf)
        val f = c.groupBy("cnt").agg(count(lit(1)).as("freq"))
          .withColumn("cum", sum(col("freq")).over(
            Window.orderBy("cnt")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val p = f.crossJoin(broadcast(tot)).agg(
          min(when(col("cum") >= expr("(n_keys*50+99) div 100"),
            col("cnt"))).as("p50_cnt"),
          min(when(col("cum") >= expr("(n_keys*90+99) div 100"),
            col("cnt"))).as("p90_cnt"),
          min(when(col("cum") >= expr("(n_keys*99+99) div 100"),
            col("cnt"))).as("p99_cnt"))
        tot.crossJoin(p).crossJoin(top1).selectExpr(
          s"""stack(9,
             |'n_rows', CAST(n_rows AS DOUBLE),
             |'n_keys', CAST(n_keys AS DOUBLE),
             |'max_cnt', CAST(max_cnt AS DOUBLE),
             |'p50_cnt', CAST(p50_cnt AS DOUBLE),
             |'p90_cnt', CAST(p90_cnt AS DOUBLE),
             |'p99_cnt', CAST(p99_cnt AS DOUBLE),
             |'skew_factor', round(CAST(max_cnt * n_keys AS DOUBLE)/n_rows, 6),
             |'top1_key', CAST(top1_key AS DOUBLE),
             |'top1_cnt', CAST(top1_cnt AS DOUBLE)
             |) AS (metric, value)""".stripMargin)
          .orderBy("metric")
      },
      Some("""WITH c AS (SELECT l_partkey AS k, COUNT(*) AS cnt
             |    FROM lineitem GROUP BY 1),
             |t AS (SELECT COUNT(*) AS n_keys, SUM(cnt) AS n_rows,
             |    MAX(cnt) AS max_cnt FROM c),
             |top1 AS (SELECT k AS top1_key, cnt AS top1_cnt FROM c
             |    ORDER BY cnt DESC, k ASC LIMIT 1),
             |f AS (SELECT cnt, COUNT(*) AS freq FROM c GROUP BY 1),
             |fc AS (SELECT cnt, SUM(freq) OVER (ORDER BY cnt
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM f),
             |p AS (SELECT
             |    MIN(CASE WHEN cum >= (n_keys*50+99)//100 THEN cnt END) AS p50_cnt,
             |    MIN(CASE WHEN cum >= (n_keys*90+99)//100 THEN cnt END) AS p90_cnt,
             |    MIN(CASE WHEN cum >= (n_keys*99+99)//100 THEN cnt END) AS p99_cnt
             |  FROM fc, t)
             |SELECT metric, value FROM (
             |  SELECT 'n_rows' AS metric, CAST(n_rows AS DOUBLE) AS value FROM t
             |  UNION ALL SELECT 'n_keys', CAST(n_keys AS DOUBLE) FROM t
             |  UNION ALL SELECT 'max_cnt', CAST(max_cnt AS DOUBLE) FROM t
             |  UNION ALL SELECT 'p50_cnt', CAST(p50_cnt AS DOUBLE) FROM p
             |  UNION ALL SELECT 'p90_cnt', CAST(p90_cnt AS DOUBLE) FROM p
             |  UNION ALL SELECT 'p99_cnt', CAST(p99_cnt AS DOUBLE) FROM p
             |  UNION ALL SELECT 'skew_factor',
             |    round(CAST(max_cnt * n_keys AS DOUBLE)/n_rows, 6) FROM t
             |  UNION ALL SELECT 'top1_key', CAST(top1_key AS DOUBLE) FROM top1
             |  UNION ALL SELECT 'top1_cnt', CAST(top1_cnt AS DOUBLE) FROM top1)
             |ORDER BY metric""".stripMargin)
    )
  )
}
