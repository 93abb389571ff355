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
    )
  )
}
