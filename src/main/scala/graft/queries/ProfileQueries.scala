package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.{Profiler, TypeStandardizer}
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Profiling-scan queries — the reference's only true aggregations (C1-C4,
  * piggybacked on its single fetchall pass; ours fuse into one `agg`).
  */
object ProfileQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------- B1 + C1
    QueryDef(
      "q_type_narrowing_stats",
      "Data-driven type narrowing (flagship B1): per numeric column of " +
        "lineitem, scanned min/max and the Integer-vs-BigInteger verdict " +
        "(ETLAlchemySource.py::standardize_column_type numeric branch).",
      (s, dir) => {
        // Declarative twin of Profiler.profile + the TypeStandardizer
        // narrowing rule: ONE fused agg over the scan, then the single
        // profile row explodes into per-column verdict rows — no eager
        // driver-side job at query-construction time (the Pipeline uses
        // Profiler, which needs the collected values; a declared query
        // must stay one lazy plan).
        val df = Tables.t(s, dir, "lineitem")
        val intCols = df.schema.fields.collect {
          case f if f.dataType == LongType || f.dataType == IntegerType ||
            f.dataType == ShortType => f.name
        }.toSeq
        val dblCols = df.schema.fields.collect {
          // DecimalType lands in the 'double' verdict branch like the
          // Profiler path classified it — if lineitem is regenerated with
          // DECIMAL columns the query keeps covering them instead of
          // silently dropping them from the profile.
          case f if f.dataType == DoubleType || f.dataType == FloatType ||
            f.dataType.isInstanceOf[DecimalType] => f.name
        }.toSeq
        val aggs = (intCols ++ dblCols).flatMap(c => Seq(
          min(col(c)).cast(DoubleType).as(s"${c}__min"),
          max(col(c)).cast(DoubleType).as(s"${c}__max")))
        val rows =
          intCols.map { c =>
            struct(lit(c).as("column_name"),
              col(s"${c}__min").as("min_value"),
              col(s"${c}__max").as("max_value"),
              when(col(s"${c}__min") >= Int.MinValue.toDouble &&
                col(s"${c}__max") <= Int.MaxValue.toDouble, "int")
                .otherwise("bigint").as("narrowed_type"))
          } ++ dblCols.map { c =>
            struct(lit(c).as("column_name"),
              col(s"${c}__min").as("min_value"),
              col(s"${c}__max").as("max_value"),
              lit("double").as("narrowed_type"))
          }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("column_name")
      },
      Some {
        val intCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        val dblCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val intSel = intCols.map { c =>
          s"""SELECT '$c' AS column_name, CAST(min($c) AS DOUBLE) AS min_value,
             |  CAST(max($c) AS DOUBLE) AS max_value,
             |  CASE WHEN min($c) >= -2147483648 AND max($c) <= 2147483647
             |       THEN 'int' ELSE 'bigint' END AS narrowed_type
             |FROM lineitem""".stripMargin
        }
        val dblSel = dblCols.map { c =>
          s"""SELECT '$c', CAST(min($c) AS DOUBLE), CAST(max($c) AS DOUBLE),
             |  'double' FROM lineitem""".stripMargin
        }
        (intSel ++ dblSel).mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY column_name")
      }
    ),

    // ----------------------------------------------------- B10 + C2
    QueryDef(
      "q_varchar_maxlen",
      "VARCHAR compression scan (B10): max(length) per string column, " +
        "rounded up to the nearest power of two " +
        "(ETLAlchemySource.py::get_nearest_power_of_two).",
      (s, dir) => {
        // Declarative: one fused max(length) agg per table, exploded to
        // per-column rows, tables unioned into a single lazy plan (the
        // scheduler overlaps the four scans inside one job — the previous
        // eager Profiler version ran four sequential collect()s at
        // query-construction time). Power-of-two rounding as an expression
        // mirroring Profiler.nearestPowerOfTwo / the oracle's CASE chain.
        def pow2(c: org.apache.spark.sql.Column) =
          (0 to 10).map(i => 1 << i).foldRight(lit(2048)) {
            case (p, rest) => when(c <= p, p).otherwise(rest)
          }
        val tables = Seq("customer", "part", "nation", "region")
        tables.map { tn =>
          val df = Tables.t(s, dir, tn)
          val scols = df.schema.fields.collect {
            case f if f.dataType == StringType => f.name
          }.toSeq
          val aggs = scols.map(c => max(length(col(c))).as(s"${c}__maxlen"))
          val rows = scols.map { c =>
            struct(lit(tn).as("table_name"), lit(c).as("column_name"),
              col(s"${c}__maxlen").cast(IntegerType).as("max_len"),
              pow2(col(s"${c}__maxlen")).cast(IntegerType).as("compressed_len"))
          }
          df.agg(aggs.head, aggs.tail: _*)
            .select(explode(array(rows: _*)).as("r"))
            .select(col("r.*"))
        }.reduce(_ union _).orderBy("table_name", "column_name")
      },
      Some {
        val cols = Seq(
          "customer" -> Seq("c_name", "c_mktsegment"),
          "part" -> Seq("p_name", "p_brand", "p_type"),
          "nation" -> Seq("n_name"),
          "region" -> Seq("r_name"))
        val pow2 = (c: String) =>
          (0 to 10).map(i => 1 << i)
            .map(p => s"WHEN max(length($c)) <= $p THEN $p")
            .mkString("CASE ", " ", " ELSE 2048 END")
        val sels = cols.flatMap { case (t, cs) =>
          cs.map(c =>
            s"""SELECT '$t' AS table_name, '$c' AS column_name,
               |  CAST(max(length($c)) AS INT) AS max_len,
               |  CAST(${pow2(c)} AS INT) AS compressed_len FROM $t""".stripMargin)
        }
        sels.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY table_name, column_name")
      }
    ),

    // ------------------------------------------------------ B8 + C3
    QueryDef(
      "q_null_profile",
      "Null-column scan (B8 empty-column elimination): per column of " +
        "orders, non-null count and the would-drop verdict.",
      (s, dir) => {
        // Declarative: count(*) + count(col) per column in ONE agg pass,
        // exploded to per-column verdict rows (B8 drop verdict =
        // rows > 0 && nonnull == 0), no eager collect.
        val df = Tables.t(s, dir, "orders")
        val cols = df.columns.toSeq
        val aggs = count(lit(1)).as("__rows") +:
          cols.map(c => count(col(c)).as(s"${c}__nn"))
        val rows = cols.map { c =>
          struct(lit(c).as("column_name"), col("__rows").as("n_rows"),
            col(s"${c}__nn").as("n_nonnull"),
            (col("__rows") - col(s"${c}__nn")).as("n_null"),
            (col("__rows") > 0 && col(s"${c}__nn") === 0).as("all_null"))
        }
        df.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("column_name")
      },
      Some {
        val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
        cols.map(c =>
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
             |  COUNT($c) AS n_nonnull, COUNT(*) - COUNT($c) AS n_null,
             |  (COUNT(*) > 0 AND COUNT($c) = 0) AS all_null FROM orders""".stripMargin)
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) ORDER BY column_name")
      }
    ),

    // ------------------------------------------------------ C4 + F1
    QueryDef(
      "q_rowcount_report",
      "Per-table row counts — the migration report's core metric (F1, " +
        "print_timings rows/sec table).",
      (s, dir) => {
        val tables = Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")
        tables.map { tn =>
          Tables.t(s, dir, tn)
            .agg(count(lit(1)).as("n_rows"))
            .select(lit(tn).as("table_name"), col("n_rows"))
        }.reduce(_ union _).orderBy("table_name")
      },
      Some {
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
          .map(t => s"SELECT '$t' AS table_name, COUNT(*) AS n_rows FROM $t")
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) ORDER BY table_name")
      }
    ),

    // ----------------------------------------------------------- C5
    QueryDef(
      "q_profile_merge",
      "Incremental profile maintenance, oracle-proven: profile the " +
        "standing corpus and the arriving batch (doc_id % 10 = 0, the " +
        "incremental-ingest convention) SEPARATELY, then merge the two " +
        "partial profiles with the semilattice ops (counts sum, mins " +
        "min, maxes max) — the declared twin of Profiler.merge, as one " +
        "lazy plan: groupBy(snapshot) partial agg, then the merge agg " +
        "over TWO rows. The oracle profiles the full table in one " +
        "pass, so the driver's gate verifies merge(profile(standing), " +
        "profile(batch)) == profile(union) EXACTLY — the algebra that " +
        "lets daily profile maintenance scan only the batch at 100 TB.",
      (s, dir) => {
        val isNew = col("doc_id") % 10 === 0
        val per = Tables.t(s, dir, "documents")
          .groupBy(when(isNew, "batch").otherwise("standing").as("snap"))
          .agg(count(lit(1)).as("rows"),
            count(col("doc_id")).as("did_nn"),
            min(col("doc_id")).cast("double").as("did_min"),
            max(col("doc_id")).cast("double").as("did_max"),
            count(col("n_chars")).as("nch_nn"),
            min(col("n_chars")).cast("double").as("nch_min"),
            max(col("n_chars")).cast("double").as("nch_max"),
            count(col("text")).as("txt_nn"),
            max(length(col("text"))).cast("long").as("txt_maxlen"),
            count(col("lang")).as("lng_nn"),
            max(length(col("lang"))).cast("long").as("lng_maxlen"),
            count(col("source")).as("src_nn"),
            max(length(col("source"))).cast("long").as("src_maxlen"))
        // the merge: every statistic is a semilattice, so re-aggregating
        // the two partial rows IS Profiler.merge
        per.agg(sum(col("rows")).as("n_rows"),
            sum(col("did_nn")).as("did_nn"),
            min(col("did_min")).as("did_min"),
            max(col("did_max")).as("did_max"),
            sum(col("nch_nn")).as("nch_nn"),
            min(col("nch_min")).as("nch_min"),
            max(col("nch_max")).as("nch_max"),
            sum(col("txt_nn")).as("txt_nn"),
            max(col("txt_maxlen")).as("txt_maxlen"),
            sum(col("lng_nn")).as("lng_nn"),
            max(col("lng_maxlen")).as("lng_maxlen"),
            sum(col("src_nn")).as("src_nn"),
            max(col("src_maxlen")).as("src_maxlen"))
          .selectExpr(
            """stack(5,
              |'doc_id', 'bigint', did_nn, did_min, did_max, CAST(NULL AS BIGINT),
              |'n_chars', 'bigint', nch_nn, nch_min, nch_max, CAST(NULL AS BIGINT),
              |'text', 'string', txt_nn, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), txt_maxlen,
              |'lang', 'string', lng_nn, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), lng_maxlen,
              |'source', 'string', src_nn, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), src_maxlen
              |) AS (column, dtype, non_null, min_num, max_num, max_len)""".stripMargin,
            "n_rows")
          .orderBy("column")
      },
      Some("""SELECT * FROM (
             |  SELECT 'doc_id' AS "column", 'bigint' AS dtype,
             |    count(doc_id) AS non_null, CAST(min(doc_id) AS DOUBLE) AS min_num,
             |    CAST(max(doc_id) AS DOUBLE) AS max_num, NULL::BIGINT AS max_len,
             |    count(*) AS n_rows FROM documents
             |  UNION ALL SELECT 'n_chars', 'bigint', count(n_chars),
             |    CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),
             |    NULL::BIGINT, count(*) FROM documents
             |  UNION ALL SELECT 'text', 'string', count(text), NULL::DOUBLE,
             |    NULL::DOUBLE, max(length(text)), count(*) FROM documents
             |  UNION ALL SELECT 'lang', 'string', count(lang), NULL::DOUBLE,
             |    NULL::DOUBLE, max(length(lang)), count(*) FROM documents
             |  UNION ALL SELECT 'source', 'string', count(source), NULL::DOUBLE,
             |    NULL::DOUBLE, max(length(source)), count(*) FROM documents
             |) ORDER BY "column"""".stripMargin)
    ),

    // ----------------------------------------------------- C6 (extension)
    QueryDef(
      "q_corr_profile",
      "Pairwise Pearson correlation over lineitem's numeric measures " +
        "(quantity, extendedprice, discount, tax) — the dependence " +
        "profile a schema-migration or feature-selection pass reads " +
        "before dropping or compressing columns. ONE fused aggregation " +
        "pass computes every Sx/Sxx/Sxy moment (15 aggregate " +
        "expressions, one scan, one partial/final exchange — the C1-C4 " +
        "fusion argument at pair grain); r derives from the moments in " +
        "closed form. Cross-engine float determinism: each moment term " +
        "is round(., 9) then summed as DECIMAL(38,9) (exact, " +
        "order-independent), and the closed-form combination is a " +
        "fixed sequence of exactly-rounded IEEE ops on identical " +
        "inputs, so r is bit-stable before its final 6dp rounding.",
      (s, dir) => {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        def dsum(e: org.apache.spark.sql.Column, name: String) =
          sum(round(e, 9).cast(DecimalType(38, 9))).cast(DoubleType).as(name)
        val pairs = for {
          i <- cols.indices; j <- cols.indices if i < j
        } yield (cols(i), cols(j))
        val aggs = Seq(count(lit(1)).cast(DoubleType).as("n")) ++
          cols.flatMap(c => Seq(
            dsum(col(c), s"s_$c"),
            dsum(col(c) * col(c), s"ss_$c"))) ++
          pairs.map { case (a, b) => dsum(col(a) * col(b), s"sp_${a}_$b") }
        val rows = pairs.map { case (a, b) =>
          val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
          val da = sqrt(col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a"))
          val db = sqrt(col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
          struct(lit(a).as("col_a"), lit(b).as("col_b"),
            col("n").cast("long").as("n_rows"),
            round(num / (da * db), 6).as("pearson_r"))
        }
        // par: the bench parquet is single-row-group, and 15 decimal
        // moment aggregations in ONE scan task serialize — the fan-out
        // guard turns this into 32-way map-side partials (measured
        // 5.8 s -> sub-second); at 100 TB the guard no-ops.
        Tables.par(s, dir, "lineitem")
          .agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("col_a", "col_b")
      },
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val sels = for {
          i <- cols.indices; j <- cols.indices if i < j
          (a, b) = (cols(i), cols(j))
        } yield {
          def ds(e: String) =
            s"CAST(sum(CAST(round($e, 9) AS DECIMAL(38,9))) AS DOUBLE)"
          s"""SELECT '$a' AS col_a, '$b' AS col_b, count(*) AS n_rows,
             |  round((count(*)::DOUBLE * ${ds(s"$a*$b")}
             |      - ${ds(a)} * ${ds(b)})
             |    / (sqrt(count(*)::DOUBLE * ${ds(s"$a*$a")}
             |        - ${ds(a)} * ${ds(a)})
             |      * sqrt(count(*)::DOUBLE * ${ds(s"$b*$b")}
             |        - ${ds(b)} * ${ds(b)})), 6) AS pearson_r
             |FROM lineitem""".stripMargin
        }
        sels.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY col_a, col_b")
      }
    ),

    // ------------------------------------- C9: cardinality sketch
    QueryDef(
      "q_cardinality_sketch",
      "Linear-counting distinct-cardinality sketch (Whang et al. 1990), " +
        "measured against the exact count it replaces: per key column " +
        "of lineitem, hash each value into m buckets (first 48 md5 " +
        "bits mod m — the repo's portable-hash convention, so both " +
        "engines fill identical buckets), estimate n ~= m*ln(m/empty), " +
        "and emit exact vs estimate vs relative error. m is DERIVED " +
        "from table cardinality (smallest power of two >= row count, " +
        "floor 4096, CAP 2^48 — the derivation asserts below the cap), " +
        "so load factor stays < 1 and the sketch can never saturate at " +
        "any reachable scale; a power of two divides 2^48 exactly, so " +
        "the mod is bias-free, and 48 hash bits keep every bucket " +
        "reachable up to the cap (r8 advice: 24 bits silently " +
        "undercounted above 2^24 rows). The " +
        "profile-at-scale story: the bucket-occupancy relation is m " +
        "bools per column INDEPENDENT of row count — mergeable by OR " +
        "across partitions, batches, and days (the semilattice the " +
        "incremental Profiler already exploits), where exact count-" +
        "distinct shuffles every distinct value; the exact branch here " +
        "exists only to measure the estimate. The ln() is rounded 9dp " +
        "before the m* multiply (libm-drift convention); everything " +
        "else is integer-exact.",
      (s, dir) => {
        val cols = Seq("l_orderkey", "l_partkey", "l_suppkey")
        val df = Tables.t(s, dir, "lineitem")
        // 1-row scalar fetch for bucket-count derivation (artifact
        // convention; see IvfIndex cell derivation).
        val nRows = df.count()
        var m = 4096L
        while (m < nRows && m < (1L << 48)) m <<= 1
        // 48 hash bits (12 md5 hex chars) cover every bucket up to the
        // 2^48 cap; beyond that the derivation would need a wider
        // substring, so fail loudly rather than undercount silently.
        require(m >= nRows || nRows <= (1L << 48),
          s"cardinality sketch bucket derivation capped at 2^48 < $nRows rows")
        val per = cols.map { c =>
          val bkt = conv(substring(md5(col(c).cast("string")), 1, 12), 16, 10)
            .cast("long") % m
          df.select(bkt.as("bkt"), col(c).as("v"))
            .agg(countDistinct(col("v")).as("exact"),
              countDistinct(col("bkt")).as("occupied"))
            .select(lit(c).as("key_col"), lit(m).as("m"), col("exact"),
              round(lit(m.toDouble) *
                round(log(lit(m.toDouble) / (lit(m) - col("occupied"))), 9), 4)
                .as("estimate"))
        }
        per.reduce(_ unionAll _)
          .withColumn("rel_err",
            round((col("estimate") - col("exact")) / col("exact"), 6))
          .orderBy("key_col")
      },
      Some(s"""WITH mm AS (SELECT MIN(CAST(POW(2, g) AS BIGINT)) AS m
              |  FROM generate_series(12, 48) t(g),
              |    (SELECT COUNT(*) AS n FROM lineitem)
              |  WHERE CAST(POW(2, g) AS BIGINT) >= n),
              |src AS (
              |  SELECT 'l_orderkey' AS key_col,
              |    CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
              |  UNION ALL SELECT 'l_partkey',
              |    CAST(l_partkey AS VARCHAR) FROM lineitem
              |  UNION ALL SELECT 'l_suppkey',
              |    CAST(l_suppkey AS VARCHAR) FROM lineitem),
              |agg AS (SELECT key_col, m, COUNT(DISTINCT v) AS exact,
              |    COUNT(DISTINCT CAST(('0x' || substr(md5(v), 1, 12)) AS BIGINT)
              |      % m) AS occupied
              |  FROM src, mm GROUP BY 1, 2),
              |est AS (SELECT key_col, m, exact,
              |    round(CAST(m AS DOUBLE) *
              |      round(ln(CAST(m AS DOUBLE) / (m - occupied)), 9), 4)
              |      AS estimate
              |  FROM agg)
              |SELECT key_col, m, exact, estimate,
              |  round((estimate - exact) / exact, 6) AS rel_err
              |FROM est ORDER BY key_col""".stripMargin)
    ),

    // ------------------------------------- C10: exact discrete quantiles
    QueryDef(
      "q_quantile_discrete",
      "Exact distributed quantiles over a discrete domain (doc token " +
        "lengths; companion to q_quantile_profile's interpolated " +
        "continuous quartiles): value-grain histogram -> cumulative " +
        "counts -> for " +
        "each percentile p, the smallest value whose cumulative count " +
        "reaches rank ceil(p*N/100), computed INTEGER-exactly as " +
        "(p*N + 99) div 100 (no double multiply to disagree at exact " +
        "boundaries; type-1 / lower-quantile definition stated rather " +
        "than inherited from either engine's builtin). Shape: the " +
        "corpus reduces to one value-grain histogram (distinct token " +
        "lengths are bounded by the context ceiling — ~10^4 at any " +
        "corpus scale), so the global cumulative window runs on the " +
        "TINY histogram relation, never the corpus; this is how exact " +
        "quantiles stay cheap at 100 TB where a sort-based percentile " +
        "would shuffle everything.",
      (s, dir) => {
        val qs = Seq(25, 50, 75, 90, 99)
        val hist = Tables.t(s, dir, "documents")
          .select(size(tokens(col("text"))).cast("long").as("v"))
          .groupBy("v").agg(count(lit(1)).as("c"))
        val tot = hist.agg(sum(col("c")).as("n"))
        val cum = hist.crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("c")).over(
            Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        cum
          .select(col("v"), col("cum"), col("n"),
            explode(array(qs.map(q => lit(q)): _*)).as("q_pct"))
          .withColumn("rank", expr("(q_pct * n + 99) div 100"))
          .filter(col("cum") >= col("rank"))
          .groupBy("q_pct")
          .agg(min(col("rank")).as("rank"), min(col("v")).as("value"),
            min(col("n")).as("n_docs"))
          .select("q_pct", "rank", "value", "n_docs")
          .orderBy("q_pct")
      },
      Some(s"""WITH h AS (SELECT CAST(len(${graft.functions.TextFunctions.toksSql}) AS BIGINT) AS v,
              |    COUNT(*) AS c FROM documents GROUP BY 1),
              |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
              |cu AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT)
              |    AS cum, n FROM h CROSS JOIN t),
              |e AS (SELECT v, cum, n, unnest([25, 50, 75, 90, 99]) AS q_pct
              |  FROM cu),
              |f AS (SELECT q_pct, CAST((q_pct * n + 99) // 100 AS BIGINT)
              |    AS rank, v, cum, n FROM e)
              |SELECT q_pct, MIN(rank) AS rank, MIN(v) AS value,
              |  MIN(n) AS n_docs
              |FROM f WHERE cum >= rank GROUP BY q_pct
              |ORDER BY q_pct""".stripMargin)
    ),

    // ------------------------------- C10' : grouped exact quantiles
    QueryDef(
      "q_quantile_grouped",
      "Per-GROUP exact discrete quantiles (q_quantile_discrete's rank " +
        "trick partitioned by language — the distribution-fairness " +
        "table a multilingual curation run reads: is the p50/p99 doc " +
        "length wildly different per language?): per (lang), the " +
        "value-grain token-length histogram, per-lang cumulative " +
        "counts, and for each percentile p the smallest value whose " +
        "cumulative count reaches rank (p*N_lang + 99) div 100 — " +
        "type-1 semantics, integer-exact, same definition as the " +
        "global query (one formula, two grains). Shape: the corpus " +
        "reduces to a (lang × distinct-length) histogram — langs × " +
        "~10^4 rows at ANY corpus scale — and the cumulative window " +
        "partitions BY LANG on that tiny relation, so adding the group " +
        "key costs nothing and serializes nothing (each language's " +
        "window partition is independent).",
      (s, dir) => {
        val qs = Seq(25, 50, 75, 90, 99)
        val hist = Tables.t(s, dir, "documents")
          .select(col("lang"),
            size(tokens(col("text"))).cast("long").as("v"))
          .groupBy("lang", "v").agg(count(lit(1)).as("c"))
        val tot = hist.groupBy(col("lang").as("tl"))
          .agg(sum(col("c")).as("n"))
        val cum = hist
          .join(broadcast(tot), col("lang") === col("tl"))
          .withColumn("cum", sum(col("c")).over(
            Window.partitionBy("lang").orderBy("v")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        cum
          .select(col("lang"), col("v"), col("cum"), col("n"),
            explode(array(qs.map(q => lit(q)): _*)).as("q_pct"))
          .withColumn("rank", expr("(q_pct * n + 99) div 100"))
          .filter(col("cum") >= col("rank"))
          .groupBy("lang", "q_pct")
          .agg(min(col("rank")).as("rank"), min(col("v")).as("value"),
            min(col("n")).as("n_docs"))
          .select("lang", "q_pct", "rank", "value", "n_docs")
          .orderBy("lang", "q_pct")
      },
      Some(s"""WITH h AS (SELECT lang,
              |    CAST(len(${graft.functions.TextFunctions.toksSql}) AS BIGINT) AS v,
              |    COUNT(*) AS c FROM documents GROUP BY 1, 2),
              |t AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n
              |  FROM h GROUP BY lang),
              |cu AS (SELECT h.lang, v,
              |    CAST(SUM(c) OVER (PARTITION BY h.lang ORDER BY v)
              |      AS BIGINT) AS cum, n
              |  FROM h JOIN t ON h.lang = t.lang),
              |e AS (SELECT lang, v, cum, n,
              |    unnest([25, 50, 75, 90, 99]) AS q_pct FROM cu),
              |f AS (SELECT lang, q_pct,
              |    CAST((q_pct * n + 99) // 100 AS BIGINT) AS rank,
              |    v, cum, n FROM e)
              |SELECT lang, q_pct, MIN(rank) AS rank, MIN(v) AS value,
              |  MIN(n) AS n_docs
              |FROM f WHERE cum >= rank GROUP BY lang, q_pct
              |ORDER BY lang, q_pct""".stripMargin)
    ),

    // ------------------------------- C12: sampled quantile sketch
    QueryDef(
      "q_quantile_sketch",
      "Sampled quantiles with MEASURED rank error — the mergeable " +
        "companion to q_quantile_discrete's exact path: a " +
        "deterministic hash-ordered reservoir (the k=256 smallest " +
        "md5(doc_id) keys via the MinKAgg Catalyst aggregate — min-k " +
        "is exactly distributive, so the SAME sample emerges at any " +
        "partitioning, merge-tree shape, or ingest schedule, where a " +
        "rand() reservoir is none of those) carries the doc's token " +
        "length; each percentile is answered from the 256-value " +
        "sample and measured against the exact histogram answer, with " +
        "the CDF value at the estimate and the rank error " +
        "|F(est) - p| — the sketch guarantee a profile consumer " +
        "actually needs (value error is meaningless on a discrete " +
        "skewed domain). Integer-exact rank selection ((p*n + 99) div " +
        "100, type-1) on BOTH paths. Shape: the sample agg collapses " +
        "each task to <= 256 entries BEFORE the single-partition " +
        "final merge (O(k) memory, ~k rows on the wire at ANY corpus " +
        "size); the exact branch exists only to measure the estimate " +
        "and is itself histogram-cheap; every window here runs on " +
        "<= 256-row or value-grain relations, never the corpus.",
      (s, dir) => {
        val K = 256
        val qs = Seq(25, 50, 75, 90, 99)
        val base = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("v"))
        // hash rank is independent of the value => uniform sample; the
        // value rides the key (zero-padded so no join is needed to
        // recover it; the 32-hex md5 prefix dominates the order)
        val key = concat(md5(col("doc_id").cast("string")), lit("|"),
          lpad(col("v").cast("string"), 6, "0"))
        val ranked = base.select(key.as("k0"))
          .agg(graft.functions.MinKAgg.minK(col("k0"), K).as("ks"))
          .select(explode(col("ks")).as("key"))
          .select(split(col("key"), "\\|").getItem(1).cast("long").as("sv"))
          .withColumn("rk", row_number().over(Window.orderBy("sv"))
            .cast("long"))
        val ns = ranked.agg(count(lit(1)).as("ns"))
        val hist = base.groupBy("v").agg(count(lit(1)).as("c"))
        val tot = hist.agg(sum(col("c")).as("n"))
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val pr = ranked.sparkSession.range(1)
          .select(explode(array(qs.map(q => lit(q)): _*)).as("q_pct"))
          .crossJoin(broadcast(ns)).crossJoin(broadcast(tot))
          .withColumn("rank_s", expr("(q_pct * ns + 99) div 100"))
          .withColumn("rank_e", expr("(q_pct * n + 99) div 100"))
        val est = pr.join(ranked, col("rank_s") === col("rk"))
        val exact = pr.select("q_pct", "rank_e")
          .join(cum.select("v", "cum"), col("cum") >= col("rank_e"))
          .groupBy("q_pct").agg(min(col("v")).as("exact_value"))
        val cdf = col("cum_est").cast("double") / col("n").cast("double")
        est.join(cum.select(col("v"), col("cum").as("cum_est")),
            col("sv") === col("v"))
          .join(exact, "q_pct")
          .select(col("q_pct"), col("exact_value"),
            col("sv").as("sample_value"), col("ns").as("sample_n"),
            round(cdf, 6).as("cdf_at_sample"),
            round(abs(cdf - col("q_pct").cast("double") / 100.0), 6)
              .as("rank_err"))
          .orderBy("q_pct")
      },
      Some(s"""WITH b AS (SELECT doc_id,
              |    CAST(len(${graft.functions.TextFunctions.toksSql}) AS BIGINT) AS v
              |  FROM documents),
              |s0 AS (SELECT v, md5(CAST(doc_id AS VARCHAR)) || '|' ||
              |    lpad(CAST(v AS VARCHAR), 6, '0') AS k0 FROM b),
              |sk AS (SELECT v FROM s0 ORDER BY k0 LIMIT 256),
              |rs AS (SELECT v AS sv,
              |    CAST(ROW_NUMBER() OVER (ORDER BY v) AS BIGINT) AS rk
              |  FROM sk),
              |nsr AS (SELECT COUNT(*) AS ns FROM rs),
              |h AS (SELECT v, COUNT(*) AS c FROM b GROUP BY 1),
              |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM h),
              |cu AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT)
              |    AS cum FROM h),
              |pr AS (SELECT q_pct, ns, n,
              |    (q_pct * ns + 99) // 100 AS rank_s,
              |    (q_pct * n + 99) // 100 AS rank_e
              |  FROM (SELECT unnest([25, 50, 75, 90, 99]) AS q_pct)
              |  CROSS JOIN nsr CROSS JOIN t),
              |es AS (SELECT pr.q_pct, pr.ns, pr.n, rs.sv FROM pr
              |  JOIN rs ON rs.rk = pr.rank_s),
              |ex AS (SELECT pr.q_pct, MIN(cu.v) AS exact_value FROM pr
              |  JOIN cu ON cu.cum >= pr.rank_e GROUP BY pr.q_pct),
              |ce AS (SELECT es.q_pct, es.ns, es.n, es.sv, cu.cum AS cum_est
              |  FROM es JOIN cu ON cu.v = es.sv)
              |SELECT ce.q_pct, ex.exact_value, ce.sv AS sample_value,
              |  ce.ns AS sample_n,
              |  round(CAST(ce.cum_est AS DOUBLE) / ce.n, 6) AS cdf_at_sample,
              |  round(abs(CAST(ce.cum_est AS DOUBLE) / ce.n
              |    - CAST(ce.q_pct AS DOUBLE) / 100.0), 6) AS rank_err
              |FROM ce JOIN ex ON ex.q_pct = ce.q_pct
              |ORDER BY ce.q_pct""".stripMargin)
    ),

    // ------------------------------------- C11: k-anonymity audit
    QueryDef(
      "q_k_anonymity",
      "k-anonymity privacy audit (Sweeney 2002) over the customer " +
        "quasi-identifier pair (nation, market segment): equivalence " +
        "classes = QI groupBy; for each k threshold, how many classes " +
        "and rows sit BELOW k (the re-identification risk table a " +
        "release gate reads), plus the class count whose sensitive " +
        "attribute (negative account balance) is CONSTANT — the " +
        "l-diversity=1 attribute-disclosure count. Complements the " +
        "H4e PII scrub: scrubbing hides direct identifiers, this " +
        "measures what the remaining quasi-identifiers still leak. " +
        "Shape: ONE class-grain agg (the only corpus-width shuffle), " +
        "then a single fused threshold agg over the class relation " +
        "(bounded by QI-combination count) and a 4-row unpivot — " +
        "identical at any row scale.",
      (s, dir) => {
        val ks = Seq(2, 5, 10, 25)
        val cls = Tables.t(s, dir, "customer")
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("k"),
            countDistinct(when(col("c_acctbal") < 0, 1).otherwise(0))
              .as("lvals"))
        val aggs = Seq(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_rows"),
          min(col("k")).as("min_k"),
          sum(when(col("lvals") === 1, 1L).otherwise(0L)).as("l1_classes")) ++
          ks.flatMap(k0 => Seq(
            sum(when(col("k") < k0, 1L).otherwise(0L)).as(s"cb_$k0"),
            sum(when(col("k") < k0, col("k")).otherwise(0L)).as(s"rb_$k0")))
        val one = cls.agg(aggs.head, aggs.tail: _*)
        val rows = ks.map(k0 => struct(lit(k0).as("k_threshold"),
          col(s"cb_$k0").as("classes_below"),
          col(s"rb_$k0").as("rows_below"),
          round(col(s"rb_$k0").cast("double") / col("n_rows"), 6)
            .as("row_frac_below")))
        one.select(explode(array(rows: _*)).as("r"),
            col("n_classes"), col("min_k"), col("l1_classes"))
          .select(col("r.*"), col("n_classes"), col("min_k"),
            col("l1_classes"))
          .orderBy("k_threshold")
      },
      Some {
        val ks = Seq(2, 5, 10, 25)
        val sums = ks.flatMap(k0 => Seq(
          s"CAST(SUM(CASE WHEN k < $k0 THEN 1 ELSE 0 END) AS BIGINT) AS cb_$k0",
          s"CAST(SUM(CASE WHEN k < $k0 THEN k ELSE 0 END) AS BIGINT) AS rb_$k0"))
        val unpiv = ks.map(k0 =>
          s"SELECT $k0 AS k_threshold, cb_$k0 AS classes_below, " +
            s"rb_$k0 AS rows_below, " +
            s"round(rb_$k0::DOUBLE / n_rows, 6) AS row_frac_below, " +
            "n_classes, min_k, l1_classes FROM a").mkString("\nUNION ALL\n")
        s"""WITH cls AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS k,
           |    COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
           |      AS lvals
           |  FROM customer GROUP BY 1, 2),
           |a AS (SELECT COUNT(*) AS n_classes,
           |    CAST(SUM(k) AS BIGINT) AS n_rows, MIN(k) AS min_k,
           |    CAST(SUM(CASE WHEN lvals = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS l1_classes, ${sums.mkString(", ")}
           |  FROM cls)
           |SELECT * FROM ($unpiv) ORDER BY k_threshold""".stripMargin
      }
    )
  )
}
