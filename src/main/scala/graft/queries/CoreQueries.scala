package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator queries (SURVEY.md §2 A/B/D/E/G).
  *
  * The reference (seanharr11/etlalchemy, ETLAlchemySource.py::migrate) only
  * ever issues `SELECT *` per table; everything else here is the Spark-first
  * mapping of its schema/movement semantics plus the §2-G extension proofs
  * (joins, windows, sorts, set ops) that a query user of the engine needs.
  */
object CoreQueries {

  /** Exact, order-independent sum of a double column: cast to DECIMAL first
    * so partial-aggregation order cannot perturb the result, then back to
    * DOUBLE for a stable comparable type. Mirrors the SQL twin
    * `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`.
    */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- A1
    QueryDef(
      "q_scan_project",
      "Full-table scan + projection (reference A1: SELECT * fetchall; " +
        "ours prunes columns at the parquet scan).",
      (s, dir) => {
        // Sort on ALL projected columns: the synthetic lineitem has ~12k
        // duplicated (l_orderkey, l_linenumber) pairs (unlike real TPC-H),
        // so the natural key alone leaves in-tie row order engine-defined
        // — remaining full-row duplicates are interchangeable.
        Tables.t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity"), col("l_extendedprice"))
          .limit(500)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |LIMIT 500""".stripMargin)
    ),

    // ------------------------------------------------------- G filters
    QueryDef(
      "q_filter_pushdown",
      "Predicate pushed to the parquet scan (PushedFilters in explain); " +
        "reference has no WHERE anywhere — extension proof.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24.0 &&
            col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
          .select("l_orderkey", "l_linenumber", "l_discount", "l_quantity")
          // full projected-column sort — (l_orderkey, l_linenumber) is NOT
          // unique in the synthetic data (see q_scan_project).
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_discount"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_discount, l_quantity
             |FROM lineitem
             |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01'
             |ORDER BY l_orderkey, l_linenumber, l_discount, l_quantity""".stripMargin)
    ),

    // ----------------------------------------------------- G aggregates
    QueryDef(
      "q_agg_groupby",
      "TPC-H Q1 shape: partial+final hash aggregate; exact decimal sums " +
        "(reference's only aggs are the C1-C4 profiling scans).",
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
        l.groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
              .as("sum_disc_price"),
            (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
            (dsum(col("l_discount"), 6) / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    ),

    // --------------------------------------------------------- G joins
    QueryDef(
      "q_join_agg",
      "Equi-join fact-to-dimension + aggregate; orders side is the small " +
        "build side (broadcast under AQE at this size; shuffle-hash at 100TB).",
      (s, dir) => {
        val l = Tables.t(s, dir, "lineitem")
        val o = Tables.t(s, dir, "orders")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("line_count"),
            dsum(col("l_extendedprice")).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS line_count,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    ),

    // --------------------------------------------------- E2 FK validation
    QueryDef(
      "q_fk_orphans",
      "Referential-integrity check: the semantic payload of reference " +
        "add_fks (ETLAlchemySource.py::add_fks ~L1350-1500) as left-anti " +
        "join orphan counts per FK edge. NULL child keys are not " +
        "orphans (SQL FK semantics: the constraint is not enforced for " +
        "NULL keys) — both engines exclude them identically.",
      (s, dir) => {
        // One scan per CHILD table, all of its edges fused
        // (graft.etl.Constraints.fkOrphansFused). Hard broadcast() hints
        // only for FIXED-cardinality dimensions (nation=25, region=5 at
        // every scale factor); part/supplier/customer grow linearly with
        // SF, so their edges leave the broadcast decision to AQE /
        // autoBroadcastJoinThreshold — at 100 TB a forced broadcast of an
        // SF-scaling key set would OOM. Replaces the previous six
        // independent anti-join branches (lineitem scanned 3x) with four
        // scans.
        import graft.etl.Constraints.{FkEdge, fkOrphansFused}
        val l = Tables.t(s, dir, "lineitem"); val o = Tables.t(s, dir, "orders")
        val c = Tables.t(s, dir, "customer"); val n = Tables.t(s, dir, "nation")
        val r = Tables.t(s, dir, "region"); val sup = Tables.t(s, dir, "supplier")
        val p = Tables.t(s, dir, "part")
        fkOrphansFused(l, Seq(
          FkEdge("lineitem.l_orderkey->orders", "l_orderkey", o, "o_orderkey",
            broadcastParent = false),
          FkEdge("lineitem.l_partkey->part", "l_partkey", p, "p_partkey",
            broadcastParent = false),
          FkEdge("lineitem.l_suppkey->supplier", "l_suppkey", sup, "s_suppkey",
            broadcastParent = false)))
          .union(fkOrphansFused(o, Seq(FkEdge(
            "orders.o_custkey->customer", "o_custkey", c, "c_custkey",
            broadcastParent = false))))
          .union(fkOrphansFused(c, Seq(FkEdge(
            "customer.c_nationkey->nation", "c_nationkey", n, "n_nationkey",
            broadcastParent = true))))
          .union(fkOrphansFused(n, Seq(FkEdge(
            "nation.n_regionkey->region", "n_regionkey", r, "r_regionkey",
            broadcastParent = true))))
          .orderBy("fk_edge")
      },
      Some("""SELECT * FROM (
             |  SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
             |    (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_count
             |  UNION ALL SELECT 'lineitem.l_partkey->part',
             |    (SELECT COUNT(*) FROM lineitem l WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
             |  UNION ALL SELECT 'lineitem.l_suppkey->supplier',
             |    (SELECT COUNT(*) FROM lineitem l WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
             |  UNION ALL SELECT 'orders.o_custkey->customer',
             |    (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             |  UNION ALL SELECT 'customer.c_nationkey->nation',
             |    (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
             |  UNION ALL SELECT 'nation.n_regionkey->region',
             |    (SELECT COUNT(*) FROM nation n WHERE n.n_regionkey IS NOT NULL AND NOT EXISTS
             |      (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
             |) ORDER BY fk_edge""".stripMargin)
    ),

    // ------------------------------------------------- B2-B4 rename/drop/cast
    QueryDef(
      "q_rename_drop_cast",
      "SchemaTransformer CSV-rule semantics (schema_transformer.py " +
        "::transform_column): rename o_totalprice->total_price_usd, retype " +
        "to DECIMAL(12,2), drop o_orderpriority.",
      (s, dir) => {
        // Final cast decimal->double: the hash compare renders values, and
        // DECIMAL keeps trailing zeros ("205941.60") where DOUBLE drops them
        // ("205941.6") — same exactness, stable rendering (see QueryDef doc).
        graft.etl.SchemaRules(
          renames = Map("o_totalprice" -> "total_price_usd",
                        "o_orderdate" -> "order_date"),
          retypes = Map("o_totalprice" -> DecimalType(12, 2)),
          deletes = Seq("o_orderpriority", "o_orderstatus"))
          .apply(Tables.t(s, dir, "orders"))
          .withColumn("total_price_usd", col("total_price_usd").cast("double"))
          .orderBy("o_orderkey")
          .limit(500)
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price_usd,
             |  o_orderdate AS order_date
             |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin)
    ),

    // ------------------------------------------------------ G sorts/topk
    QueryDef(
      "q_sort_limit",
      "Global top-k: Spark TakeOrderedAndProject — no full sort at scale.",
      (s, dir) => {
        Tables.t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin)
    ),

    // --------------------------------------------------------- G set ops
    QueryDef(
      "q_set_ops",
      "UNION / EXCEPT / INTERSECT over customer segments (reference has " +
        "none; Spark Union/Except/Intersect physical ops).",
      (s, dir) => {
        val c = Tables.t(s, dir, "customer")
        val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val b = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
        val u = a.union(b).distinct().withColumn("set_op", lit("union"))
        val e = a.except(b).withColumn("set_op", lit("except"))
        val i = a.intersect(b).withColumn("set_op", lit("intersect"))
        u.union(e).union(i).select("set_op", "c_custkey")
          .orderBy("set_op", "c_custkey")
      },
      Some("""WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
             |SELECT * FROM (
             |  SELECT 'union' AS set_op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
             |  UNION ALL SELECT 'except', c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
             |  UNION ALL SELECT 'intersect', c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
             |) ORDER BY set_op, c_custkey""".stripMargin)
    ),

    // ------------------------------------------------------- G windows
    QueryDef(
      "q_window_topk",
      "Top-3 orders per customer by totalprice: Window.partitionBy + " +
        "row_number (partition-local sort only — scales without global sort).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.t(s, dir, "orders")
          .withColumn("rank_in_cust", row_number().over(w))
          .filter(col("rank_in_cust") <= 3)
          .select("o_custkey", "rank_in_cust", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "rank_in_cust")
      },
      Some("""SELECT o_custkey, rank_in_cust, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
             |  FROM orders)
             |WHERE rank_in_cust <= 3 ORDER BY o_custkey, rank_in_cust""".stripMargin)
    ),

    // ------------------------------------------------ G grouping sets
    QueryDef(
      "q_rollup",
      "Hierarchical totals via ROLLUP (year, returnflag): Spark Expand + " +
        "single hash agg — subtotals come from one pass, not one job per " +
        "level. gid disambiguates NULL group values from subtotal rows.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select(year(col("l_shipdate")).as("ship_year"),
            col("l_returnflag").as("flag"), col("l_quantity"))
          .rollup("ship_year", "flag")
          .agg(
            (grouping(col("ship_year")) * 2 + grouping(col("flag")))
              .cast(IntegerType).as("gid"),
            count(lit(1)).as("n"),
            dsum(col("l_quantity")).as("sum_qty"))
          .select("gid", "ship_year", "flag", "n", "sum_qty")
          .orderBy(col("gid"), col("ship_year").asc_nulls_first,
            col("flag").asc_nulls_first)
      },
      Some("""WITH t AS (SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |  l_returnflag AS flag, l_quantity FROM lineitem)
             |SELECT CAST(GROUPING(ship_year) * 2 + GROUPING(flag) AS INT) AS gid,
             |  ship_year, flag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM t GROUP BY ROLLUP(ship_year, flag)
             |ORDER BY gid, ship_year NULLS FIRST, flag NULLS FIRST""".stripMargin)
    ),

    // ------------------------------------------- C-extension: quantiles
    QueryDef(
      "q_quantile_profile",
      "Exact linear-interpolated quartiles per returnflag (profiling-scan " +
        "extension of C1): Spark percentile() == DuckDB quantile_cont. At " +
        "100 TB swap percentile -> percentile_approx (t-digest sketch, " +
        "mergeable map-side) — same plan shape, bounded memory.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            percentile(col("l_extendedprice"), lit(0.25)).as("p25"),
            percentile(col("l_extendedprice"), lit(0.5)).as("p50"),
            percentile(col("l_extendedprice"), lit(0.75)).as("p75"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), round(col("p25"), 4).as("p25"),
            round(col("p50"), 4).as("p50"), round(col("p75"), 4).as("p75"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
             |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
             |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    ),

    // ------------------------------------------ C-extension: histogram
    QueryDef(
      "q_histogram",
      "Equal-width 10-bin histogram of l_extendedprice (profiling-scan " +
        "extension of C1: the distribution shape min/max/quantiles " +
        "summarize away). Two passes: a min/max agg broadcast as a " +
        "1-row relation, then a stateless bin-assignment scan + one " +
        "bin-grain agg — at 100 TB the first pass rides the same " +
        "profile scan as C1's ranges and the second is map-side " +
        "partial over <=10 groups. Bin id and edges are computed from " +
        "the IDENTICAL IEEE expression text in both engines " +
        "(floor(((x-mn)*10)/(mx-mn)), capped at 9; edge = mn + bin*w " +
        "with w=(mx-mn)/10), so placement can never diverge.",
      (s, dir) => {
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_extendedprice").as("x"))
        val mm = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        li.crossJoin(broadcast(mm))
          .withColumn("bin",
            least(lit(9L), floor((col("x") - col("mn")) * lit(10.0)
              / (col("mx") - col("mn")))).cast("int"))
          .withColumn("w", (col("mx") - col("mn")) / lit(10.0))
          .groupBy("bin", "mn", "w")
          .agg(count(lit(1)).as("n"))
          .select(col("bin"),
            round(col("mn") + col("bin") * col("w"), 4).as("lo"),
            round(col("mn") + (col("bin") + 1) * col("w"), 4).as("hi"),
            col("n"))
          .orderBy("bin")
      },
      Some("""WITH mm AS (SELECT MIN(l_extendedprice) AS mn,
             |    MAX(l_extendedprice) AS mx FROM lineitem),
             |b AS (SELECT CAST(LEAST(9, FLOOR(((l_extendedprice - mn) * 10.0)
             |      / (mx - mn))) AS INT) AS bin,
             |    mn, (mx - mn) / 10.0 AS w
             |  FROM lineitem, mm)
             |SELECT bin, round(mn + bin * w, 4) AS lo,
             |  round(mn + (bin + 1) * w, 4) AS hi, COUNT(*) AS n
             |FROM b GROUP BY bin, mn, w ORDER BY bin""".stripMargin)
    ),

    // --------------------------------------------------------- G pivot
    QueryDef(
      "q_pivot",
      "Pivot to wide: quantity by ship_year x returnflag. Pivot values " +
        "are EXPLICIT so Spark skips the extra distinct-scan job a " +
        "value-less pivot would run first.",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .select(year(col("l_shipdate")).as("ship_year"),
            col("l_returnflag"), col("l_quantity"))
          .groupBy("ship_year")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(dsum(col("l_quantity")))
          .select(col("ship_year"), col("A").as("qty_a"),
            col("N").as("qty_n"), col("R").as("qty_r"))
          .orderBy("ship_year")
      },
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |  CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_a,
             |  CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_n,
             |  CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_r
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    // -------------------------------------------------- D1-D3 string funcs
    QueryDef(
      "q_string_funcs",
      "Scalar string functions (reference D1 literal rendering: quoting, " +
        "escapes): upper/substring/concat/trim/replace — all codegen'd.",
      (s, dir) => {
        Tables.t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_name"), 1, 10).as("name10"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            length(col("p_name")).as("name_len"),
            regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u,
             |  substring(p_name, 1, 10) AS name10,
             |  concat_ws('|', p_brand, p_type) AS brand_type,
             |  length(p_name) AS name_len,
             |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
             |FROM part ORDER BY p_partkey""".stripMargin)
    ),

    // ----------------------------------------------------- D2 date funcs
    QueryDef(
      "q_date_funcs",
      "Date/time scalar functions (reference D2 per-dialect datetime " +
        "literal rendering → date_format/year/month/date_trunc).",
      (s, dir) => {
        Tables.t(s, dir, "lineitem")
          .groupBy(
            year(col("l_shipdate")).as("ship_year"),
            month(col("l_shipdate")).as("ship_month"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice")).as("revenue"))
          .orderBy("ship_year", "ship_month")
      },
      Some("""SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
             |  CAST(month(l_shipdate) AS INT) AS ship_month,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    )
  )
}
