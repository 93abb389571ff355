package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.types._

class TypeStandardizerSpec extends SparkSpec {
  import TypeStandardizer._

  private def prof(min: Double, max: Double) = Some(ColumnProfile(
    "c", LongType, 10, Some(min), Some(max), None))

  test("dialect rule table maps the reference's type universe (B1)") {
    assert(standardizeTypeName("VARCHAR2(255)")._1 == StringType)
    assert(standardizeTypeName("NVARCHAR(100)")._1 == StringType)
    assert(standardizeTypeName("CLOB")._1 == StringType)
    assert(standardizeTypeName("NUMBER(10,2)")._1 == DoubleType)
    assert(standardizeTypeName("NUMBER(20,4)")._1 == DecimalType(20, 4))
    assert(standardizeTypeName("DECIMAL(38,10)")._1 == DecimalType(38, 10))
    assert(standardizeTypeName("BIGINT")._1 == LongType)
    assert(standardizeTypeName("SMALLINT")._1 == ShortType)
    assert(standardizeTypeName("BINARY_DOUBLE")._1 == DoubleType)
    assert(standardizeTypeName("DATE")._1 == DateType)
    assert(standardizeTypeName("DATETIME")._1 == TimestampType)
    assert(standardizeTypeName("TIMESTAMP WITH TIME ZONE")._1 == TimestampType)
    assert(standardizeTypeName("BIT")._1 == BooleanType)
    assert(standardizeTypeName("IMAGE")._1 == BinaryType)
    assert(standardizeTypeName("LONG RAW")._1 == BinaryType)
    assert(standardizeTypeName("SOMETHING_ELSE")._1 == StringType)
  }

  test("NUMBER(p,0) narrows by scanned range (C1)") {
    assert(standardizeTypeName("NUMBER(12,0)", prof(0, 1000))._1 == IntegerType)
    assert(standardizeTypeName("NUMBER(12,0)", prof(0, 3e9))._1 == LongType)
    assert(standardizeTypeName("INTEGER", prof(-3e9, 0))._1 == LongType)
    assert(standardizeTypeName("INTEGER", None)._1 == LongType) // unprofiled: safe
  }

  test("standardize() narrows int64 columns whose data fits int32") {
    import spark.implicits._
    val df = Seq((1L, 5000000000L), (2L, 6000000000L)).toDF("small", "big")
    val (out, logs) = TypeStandardizer.standardize(df, Profiler.profile(df))
    assert(out.schema("small").dataType == IntegerType)
    assert(out.schema("big").dataType == LongType)
    assert(logs.map(_.column) == Seq("small"))
    // idempotence: a second pass changes nothing
    val (out2, logs2) = TypeStandardizer.standardize(out, Profiler.profile(out))
    assert(out2.schema == out.schema && logs2.isEmpty)
  }

  test("varchar compression consults profile (B10)") {
    val p = Some(ColumnProfile("c", StringType, 10, None, None, Some(37)))
    assert(standardizeTypeName("VARCHAR(255)", p, compressVarchar = true)._2
      == "String(64)")
    assert(standardizeTypeName("VARCHAR(255)", p)._2 == "String(255)")
  }
}
