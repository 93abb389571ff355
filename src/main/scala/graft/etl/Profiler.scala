package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column profile computed in ONE fused aggregation pass — the Spark
  * mapping of the reference's profiling scans C1-C4, which it piggybacks on
  * the single fetchall() of every table (ETLAlchemySource.py
  * ::standardize_column_type ~L150-400 reading `raw_rows`):
  *
  *   C1 numeric min/max        -> Integer vs BigInteger narrowing
  *   C2 string max(length)     -> VARCHAR compression (B10)
  *   C3 per-column null counts -> empty-column elimination (B8)
  *   C4 row count              -> report + empty-table skip (B9)
  *
  * One `df.agg(...)` with 3 expressions per column collapses to a single
  * partial+final aggregate over one scan — at 100 TB this is one pass over
  * the data with a few KB of state per partition, no shuffle beyond the
  * final single-row reduce.
  */
final case class ColumnProfile(
    name: String,
    dataType: DataType,
    nonNullCount: Long,
    minNumeric: Option[Double],
    maxNumeric: Option[Double],
    maxLength: Option[Int]) {
  def isAllNull(totalRows: Long): Boolean = totalRows > 0 && nonNullCount == 0
}

final case class TableProfile(rowCount: Long, columns: Seq[ColumnProfile]) {
  def apply(name: String): ColumnProfile =
    columns.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"no profile for column $name"))
}

object Profiler {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** Single-pass profile: count(1) + per-column [count, min/max | max(len)]. */
  def profile(df: DataFrame): TableProfile = {
    val fields = df.schema.fields.toSeq
    val aggs = Seq(count(lit(1)).as("__rows")) ++ fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(count(c).as(s"${f.name}__nn"))
      f.dataType match {
        case dt if isNumeric(dt) =>
          base ++ Seq(
            min(c).cast(DoubleType).as(s"${f.name}__min"),
            max(c).cast(DoubleType).as(s"${f.name}__max"))
        case StringType =>
          base :+ max(length(c)).as(s"${f.name}__maxlen")
        case BinaryType =>
          base :+ max(octet_length(c)).as(s"${f.name}__maxlen")
        case _ => base
      }
    }
    val row: Row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val rows = row.getAs[Long]("__rows")
    val cols = fields.map { f =>
      ColumnProfile(
        name = f.name,
        dataType = f.dataType,
        nonNullCount = row.getAs[Long](s"${f.name}__nn"),
        minNumeric =
          if (isNumeric(f.dataType)) opt[Double](s"${f.name}__min") else None,
        maxNumeric =
          if (isNumeric(f.dataType)) opt[Double](s"${f.name}__max") else None,
        maxLength = f.dataType match {
          case StringType | BinaryType => opt[Int](s"${f.name}__maxlen")
          case _                       => None
        })
    }
    TableProfile(rows, cols)
  }

  /** B10 VARCHAR compression helper — reference
    * ETLAlchemySource.py::get_nearest_power_of_two (~L130-145): smallest
    * power of two >= n (minimum 1).
    */
  def nearestPowerOfTwo(n: Int): Int =
    if (n <= 1) 1 else Integer.highestOneBit(n - 1) << 1

  /** Merge two table profiles — the incremental-ingest form of the
    * profiling pass: every statistic the profile carries (count, min,
    * max, max length) is a semilattice, so `profile(standing ∪ batch) ==
    * merge(profile(standing), profile(batch))` EXACTLY and the daily
    * profile maintenance scans only the batch, never the 100 TB
    * standing table. (The reference rescans everything per run —
    * `standardize_column_type` over the full fetchall; this is the
    * operation that makes type-narrowing decisions maintainable at
    * scale. A non-mergeable statistic — e.g. exact distinct — must NOT
    * be added here without a sketch.) Columns must match by name and
    * type; PROFILE drift (a batch adding columns) is the caller's
    * schema-evolution problem, surfaced as an error not a silent drop.
    */
  def merge(a: TableProfile, b: TableProfile): TableProfile = {
    require(a.columns.map(c => (c.name, c.dataType)) ==
      b.columns.map(c => (c.name, c.dataType)),
      "profiles cover different schemas — align columns before merging")
    def m[T](x: Option[T], y: Option[T], pick: (T, T) => T): Option[T] =
      (x, y) match {
        case (Some(p), Some(q)) => Some(pick(p, q))
        case _                  => x.orElse(y)
      }
    TableProfile(
      a.rowCount + b.rowCount,
      a.columns.zip(b.columns).map { case (ca, cb) =>
        ca.copy(
          nonNullCount = ca.nonNullCount + cb.nonNullCount,
          minNumeric = m[Double](ca.minNumeric, cb.minNumeric, math.min),
          maxNumeric = m[Double](ca.maxNumeric, cb.maxNumeric, math.max),
          maxLength = m[Int](ca.maxLength, cb.maxLength, math.max))
      })
  }
}
