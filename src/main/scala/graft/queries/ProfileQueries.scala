package graft.queries

import graft.{QueryDef, Tables}
import graft.etl.{Profiler, TypeStandardizer}
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
        val df = Tables.t(s, dir, "lineitem")
        val prof = Profiler.profile(df)
        val rows = prof.columns.filter(_.minNumeric.isDefined).map { c =>
          val narrowed = c.dataType match {
            case LongType | IntegerType | ShortType =>
              if (c.maxNumeric.forall(_ <= Int.MaxValue.toDouble) &&
                c.minNumeric.forall(_ >= Int.MinValue.toDouble)) "int"
              else "bigint"
            case _ => "double"
          }
          (c.name, c.minNumeric.get, c.maxNumeric.get, narrowed)
        }
        val spark = s; import spark.implicits._
        rows.toDF("column_name", "min_value", "max_value", "narrowed_type")
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
        val tables = Seq("customer", "part", "nation", "region")
        val perTable = tables.map { tn =>
          val df = Tables.t(s, dir, tn)
          val prof = Profiler.profile(df)
          prof.columns.filter(c => c.dataType == StringType).map { c =>
            (tn, c.name, c.maxLength.getOrElse(0),
              Profiler.nearestPowerOfTwo(c.maxLength.getOrElse(0)))
          }
        }
        val spark = s; import spark.implicits._
        perTable.flatten
          .toDF("table_name", "column_name", "max_len", "compressed_len")
          .orderBy("table_name", "column_name")
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
        val df = Tables.t(s, dir, "orders")
        val prof = Profiler.profile(df)
        val spark = s; import spark.implicits._
        prof.columns
          .map(c => (c.name, prof.rowCount, c.nonNullCount,
            prof.rowCount - c.nonNullCount, c.isAllNull(prof.rowCount)))
          .toDF("column_name", "n_rows", "n_nonnull", "n_null", "all_null")
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
    )
  )
}
