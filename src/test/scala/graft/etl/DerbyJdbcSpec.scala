package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A4-A9 live JDBC load path, exercised end-to-end against embedded Derby
  * (the one RDBMS in this environment — it ships with Spark). The write
  * is the real `df.write.jdbc` code path: Spark emits target DDL
  * (A10/A11 via SaveMode.Overwrite = drop-and-recreate), then each
  * partition streams batched INSERTs (A4's INSERT staging / A5-A9's
  * bulk-load analogue; reference `ETLAlchemySource.py::send_data`
  * ~L900-1150). The per-dialect URL knobs in jdbcOptions are config-only
  * here because no MySQL/Postgres/Oracle server exists to connect to.
  */
class DerbyJdbcSpec extends SparkSpec {
  import StagingWriter._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def sampleDf = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("active", BooleanType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "alice", true, 1.5),
        Row(2, "bob", false, null),
        Row(3, null, null, -2.25)),
      schema)
  }

  test("writeJdbc round-trips rows through a live JDBC target (A4-A9)") {
    writeJdbc(sampleDf, Sqlite, url, "staged_docs")
    val back = readJdbc(spark, url, "staged_docs")
    assert(back.count() == 3)
    // boolAsInt canonicalization survived the round trip
    val rows = back.orderBy("id").collect()
    assert(rows(0).getAs[Int]("active") == 1)
    assert(rows(1).getAs[Int]("active") == 0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("active")))
    assert(rows(2).isNullAt(rows(2).fieldIndex("name")))
    assert(rows(2).getAs[Double]("score") == -2.25)
  }

  test("SaveMode.Overwrite drops and recreates the target table (A10/A11)") {
    writeJdbc(sampleDf, Postgres, url, "staged_overwrite")
    writeJdbc(sampleDf.filter(col("id") === 1), Postgres, url, "staged_overwrite")
    val back = readJdbc(spark, url, "staged_overwrite")
    assert(back.count() == 1) // second write replaced, not appended
    // Postgres dialect keeps native booleans through canonicalize
    assert(back.schema("active").dataType == BooleanType)
  }

  test("partition-parallel load: multi-partition df lands all rows (D4)") {
    val big = spark.range(0, 1000, 1, 8)
      .select(col("id").cast(IntegerType).as("id"),
        concat(lit("row_"), col("id")).as("name"),
        (col("id") % 2 === 0).as("active"),
        (col("id") * 1.5).as("score"))
    writeJdbc(big, MySql, url, "staged_big")
    val back = readJdbc(spark, url, "staged_big")
    assert(back.count() == 1000)
    assert(back.agg(sum("id")).head.getLong(0) == 499500L)
  }
}
