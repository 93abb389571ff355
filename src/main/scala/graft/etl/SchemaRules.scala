package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

/** Declarative schema-transform rules — the Spark-first re-expression of the
  * reference's CSV-driven SchemaTransformer (schema_transformer.py
  * ::transform_column ~L120-200, ::transform_table ~L90-120):
  *
  *   - B2 column rename (+ global suffix renames, e.g. `*_dte` -> `*_date`)
  *   - B3 column delete
  *   - B4 column retype (forced cast, overrides type standardization)
  *   - B5 global ignored suffixes (drop every column ending with suffix)
  *
  * All four are pure plan rewrites in Spark (no data movement): a single
  * `select` with casts/aliases that Catalyst folds into the scan, so column
  * pruning still reaches parquet. At 100 TB this costs nothing — unlike the
  * reference, which re-materializes every staged row tuple on delete
  * (ETLAlchemySource.py::add_or_eliminate_column).
  */
final case class SchemaRules(
    renames: Map[String, String] = Map.empty,
    retypes: Map[String, DataType] = Map.empty,
    deletes: Seq[String] = Nil,
    suffixRenames: Map[String, String] = Map.empty, // old suffix -> new suffix
    ignoredSuffixes: Seq[String] = Nil) {

  /** New name for a column after explicit + suffix renames (None = dropped). */
  def targetName(c: String): Option[String] = {
    if (deletes.contains(c) || ignoredSuffixes.exists(c.endsWith)) None
    else {
      val explicit = renames.get(c)
      val bySuffix = suffixRenames.collectFirst {
        case (old, nw) if c.endsWith(old) => c.dropRight(old.length) + nw
      }
      Some(explicit.orElse(bySuffix).getOrElse(c))
    }
  }

  def apply(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq.flatMap { c =>
      targetName(c).map { nm =>
        val base = retypes.get(c).map(t => col(c).cast(t)).getOrElse(col(c))
        base.as(nm)
      }
    }
    df.select(cols: _*)
  }
}

object SchemaRules {
  /** Parse the reference's CSV rule format (schema_transformer.py header:
    * `Table Name, Column Name, New Table Name, New Column Name,
    *  New Column Type, Delete`). Table-scoped: returns rules per table.
    * Lines with empty column name are table rules (B6 rename / B7 delete).
    */
  def parseCsv(lines: Seq[String]): Map[String, SchemaRules] = {
    val rows = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.toLowerCase.startsWith("table name"))
      .map(_.split(",", -1).map(_.trim).padTo(6, ""))
      .toSeq
    rows.groupBy(_(0)).map { case (table, rs) =>
      val colRules = rs.filter(_(1).nonEmpty)
      table -> SchemaRules(
        renames = colRules.collect {
          case r if r(3).nonEmpty && !isTrue(r(5)) => r(1) -> r(3)
        }.toMap,
        retypes = colRules.collect {
          case r if r(4).nonEmpty && !isTrue(r(5)) =>
            r(1) -> DataType.fromDDL(r(4))
        }.toMap,
        deletes = colRules.collect { case r if isTrue(r(5)) => r(1) })
    }
  }

  /** Table-level verdicts from the same CSV (B6 rename, B7 delete). */
  def parseTableRules(lines: Seq[String]): Map[String, Option[String]] = {
    lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.toLowerCase.startsWith("table name"))
      .map(_.split(",", -1).map(_.trim).padTo(6, ""))
      .filter(_(1).isEmpty)
      .map { r =>
        r(0) -> (if (isTrue(r(5))) None
                 else Some(if (r(2).nonEmpty) r(2) else r(0)))
      }
      .toMap
  }

  private def isTrue(s: String): Boolean =
    s.equalsIgnoreCase("true") || s == "1" || s.equalsIgnoreCase("t")
}
