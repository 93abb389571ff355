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

  /** Skew diagnostic summary over a per-key count relation `c` with
    * columns (`k` numeric, `cnt` long) — the shared reduction behind
    * `q_skew_profile` (batch: counts from one groupBy) and
    * [[graft.streaming.SkewStream]] (streaming: counts from keyed
    * state), so the two faces cannot drift. Percentiles are taken over
    * the COUNT-VALUE frequency relation (distinct count values — a few
    * hundred rows under any Zipfian real-world distribution, vs
    * billions of keys), so the rank selection never needs a global sort
    * of the key relation; rank = ceil(q*n_keys) in pure integer
    * arithmetic so every engine picks the identical row.
    */
  private[graft] def skewSummary(
      c: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
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
  }

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
      (s, dir) =>
        skewSummary(Tables.t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("cnt"))),
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
    ),

    QueryDef(
      "q_fuzzy_join",
      "Entity resolution by fuzzy string match (token blocking + edit-" +
        "distance verify): near-identical part names with the part " +
        "counts they cover. Runs at DISTINCT-NAME grain — the name " +
        "relation is the entity vocabulary (64 names for 2000 parts " +
        "here; the same orders-of-magnitude reduction holds for real " +
        "catalogs), so the quadratic-ish candidate step never touches " +
        "row grain and the resolved pairs broadcast back if row-grain " +
        "repair is needed. Blocking: names sharing >=1 token become " +
        "candidates via a token equi-join (never a cartesian); verify " +
        "is codegen'd levenshtein <= 3, integer-exact in both engines. " +
        "At 100 TB the only corpus-scale work is the distinct-name agg " +
        "(map-side partial); blocking+verify run on the vocabulary.",
      (s, dir) => {
        val names = Tables.t(s, dir, "part")
          .groupBy(col("p_name").as("name"))
          .agg(count(lit(1)).as("n_parts"))
        val toks = names.select(col("name"),
          explode(split(col("name"), " ")).as("tok"))
        val cand = toks.as("a")
          .join(toks.as("b"),
            col("a.tok") === col("b.tok") && col("a.name") < col("b.name"))
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
          .distinct()
        cand
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 3)
          .join(names.select(col("name").as("name_a"),
            col("n_parts").as("parts_a")), "name_a")
          .join(names.select(col("name").as("name_b"),
            col("n_parts").as("parts_b")), "name_b")
          .select("name_a", "name_b", "dist", "parts_a", "parts_b")
          .orderBy("name_a", "name_b")
      },
      Some("""WITH names AS (SELECT p_name AS name, COUNT(*) AS n_parts
             |    FROM part GROUP BY 1),
             |t AS (SELECT name, unnest(string_split(name, ' ')) AS tok
             |  FROM names),
             |cand AS (SELECT DISTINCT a.name AS name_a, b.name AS name_b
             |  FROM t a JOIN t b ON a.tok = b.tok AND a.name < b.name),
             |v AS (SELECT name_a, name_b,
             |    levenshtein(name_a, name_b) AS dist FROM cand)
             |SELECT name_a, name_b, dist,
             |  na.n_parts AS parts_a, nb.n_parts AS parts_b
             |FROM v JOIN names na ON v.name_a = na.name
             |  JOIN names nb ON v.name_b = nb.name
             |WHERE dist <= 3
             |ORDER BY name_a, name_b""".stripMargin)
    )
  )
}
