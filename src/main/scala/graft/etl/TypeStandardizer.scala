package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Type standardization — the reference's flagship operator (B1,
  * ETLAlchemySource.py::standardize_column_type ~L150-400): map every
  * dialect-specific source type to a canonical type, consulting the actual
  * data (via [[Profiler]]'s single-pass stats) to narrow:
  *
  *   - NUMBER/NUMERIC/DECIMAL(p,0) -> IntegerType vs LongType by scanned
  *     min/max (upstream picks Integer vs BigInteger the same way)
  *   - NUMBER(p, s>0) -> DoubleType or DecimalType(p,s)
  *   - VARCHAR/VARCHAR2/CHAR/TEXT/CLOB -> StringType, with max-length metadata
  *     (compressed to nearest power of two when compressVarchar, B10)
  *   - BIT/BOOLEAN -> BooleanType; BLOB/RAW/BINARY/IMAGE -> BinaryType
  *   - DATE / DATETIME / TIMESTAMP -> DateType / TimestampType
  *
  * The rule table is plain Scala — no custom Catalyst needed; the resulting
  * casts are Catalyst expressions that fold into the scan projection.
  */
object TypeStandardizer {

  final case class ConversionLog(
      column: String,
      from: String,
      to: DataType,
      reason: String)

  /** Map a source dialect type name (as a reflected RDBMS would report it,
    * e.g. "VARCHAR2(255)", "NUMBER(10,0)", "BIT") to a canonical Spark type,
    * consulting the column's profile for data-driven narrowing.
    */
  def standardizeTypeName(
      dialectType: String,
      profile: Option[ColumnProfile] = None,
      compressVarchar: Boolean = false): (DataType, String) = {
    val t = dialectType.trim.toUpperCase
    val base = t.takeWhile(c => c != '(').trim
    val params: Seq[Int] = {
      val i = t.indexOf('(')
      if (i < 0) Nil
      else t.substring(i + 1, t.lastIndexOf(')') max (i + 1))
        .split(",").toSeq.map(_.trim).filter(_.matches("-?\\d+")).map(_.toInt)
    }
    base match {
      case "VARCHAR" | "VARCHAR2" | "NVARCHAR" | "NVARCHAR2" | "CHAR" |
          "NCHAR" | "CHARACTER" | "STRING" =>
        val declared = params.headOption.getOrElse(255)
        val n = profile.flatMap(_.maxLength) match {
          case Some(m) if compressVarchar => Profiler.nearestPowerOfTwo(m)
          case _                          => declared
        }
        (StringType, s"String($n)")
      case "TEXT" | "CLOB" | "NCLOB" | "LONGTEXT" | "MEDIUMTEXT" =>
        (StringType, "Text")
      case "NUMBER" | "NUMERIC" | "DECIMAL" | "DEC" =>
        val p = params.headOption.getOrElse(38)
        val s = params.drop(1).headOption.getOrElse(0)
        if (s > 0) {
          if (p <= 15) (DoubleType, s"Numeric($p,$s)->Double")
          else (DecimalType(p.min(38), s), s"Numeric($p,$s)")
        } else narrowIntegral(profile, s"Numeric($p,0)")
      case "INTEGER" | "INT" | "INT4" | "MEDIUMINT" =>
        narrowIntegral(profile, "Integer")
      case "BIGINT" | "INT8" => (LongType, "BigInteger")
      case "SMALLINT" | "INT2" | "TINYINT" =>
        (ShortType, "SmallInteger")
      case "FLOAT" | "REAL" | "DOUBLE" | "BINARY_FLOAT" | "BINARY_DOUBLE" |
          "DOUBLE PRECISION" =>
        (DoubleType, "Float")
      case "DATE"                          => (DateType, "Date")
      case "TIME"                          => (StringType, "Time->String")
      case "DATETIME" | "TIMESTAMP" | "SMALLDATETIME" |
          "TIMESTAMP WITH TIME ZONE" | "TIMESTAMP WITHOUT TIME ZONE" =>
        (TimestampType, "DateTime")
      case "BOOLEAN" | "BOOL" | "BIT" => (BooleanType, "Boolean")
      case "BLOB" | "RAW" | "LONG RAW" | "BINARY" | "VARBINARY" | "IMAGE" |
          "BYTEA" =>
        (BinaryType, "LargeBinary")
      case _ => (StringType, s"Unknown($dialectType)->String")
    }
  }

  /** C1 data-driven integral narrowing: Integer iff scanned range fits. */
  private def narrowIntegral(
      profile: Option[ColumnProfile], label: String): (DataType, String) =
    profile match {
      case Some(p) =>
        val fitsInt = p.maxNumeric.forall(_ <= Int.MaxValue.toDouble) &&
          p.minNumeric.forall(_ >= Int.MinValue.toDouble)
        if (fitsInt) (IntegerType, s"$label->Integer(range-scanned)")
        else (LongType, s"$label->BigInteger(range-scanned)")
      case None => (LongType, s"$label->BigInteger(unprofiled)")
    }

  /** Narrow an already-typed DataFrame using its profile: LongType columns
    * whose scanned range fits Int become IntegerType (the engine-native
    * analogue of upstream's Integer-vs-BigInteger choice). Returns the
    * narrowed frame plus a conversion log (report section F1
    * "Column Conversions").
    */
  def standardize(
      df: DataFrame,
      profile: TableProfile): (DataFrame, Seq[ConversionLog]) = {
    val logs = Seq.newBuilder[ConversionLog]
    val cols = df.schema.fields.toSeq.map { f =>
      val p = profile.columns.find(_.name == f.name)
      f.dataType match {
        case LongType
            if p.exists(cp => cp.nonNullCount > 0 &&
              cp.maxNumeric.forall(_ <= Int.MaxValue.toDouble) &&
              cp.minNumeric.forall(_ >= Int.MinValue.toDouble)) =>
          logs += ConversionLog(f.name, "bigint", IntegerType, "range fits int32")
          col(f.name).cast(IntegerType).as(f.name)
        case _ => col(f.name)
      }
    }
    (df.select(cols: _*), logs.result())
  }
}
