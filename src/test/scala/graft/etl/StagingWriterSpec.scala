package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StagingWriterSpec extends SparkSpec {
  import StagingWriter._

  private def sampleDf = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("active", BooleanType, nullable = true),
      StructField("note", StringType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "alice", true, "has, comma"),
        Row(2, "bob \"quoted\"", false, ""),
        Row(3, null, null, "plain")),
      schema)
  }

  test("canonicalize: bool->0/1 and ''-as-NULL per dialect (D1/D3)") {
    val my = canonicalize(sampleDf, MySql).collect().sortBy(_.getInt(0))
    assert(my(0).getInt(2) == 1 && my(1).getInt(2) == 0) // bool -> int
    assert(my(1).getString(3) == "") // mysql keeps empty string

    val ora = canonicalize(sampleDf, Oracle).collect().sortBy(_.getInt(0))
    assert(ora(1).isNullAt(3)) // oracle: '' IS NULL
    assert(ora(2).isNullAt(2)) // null bool stays null through the cast

    val pg = canonicalize(sampleDf, Postgres).collect().sortBy(_.getInt(0))
    assert(pg(0).getBoolean(2)) // postgres keeps native bool
  }

  test("writeCsv round-trips values through each dialect's conventions (A3)") {
    Seq(MySql, Postgres, Oracle, Sqlite).foreach { d =>
      val dir = Files.createTempDirectory(s"graft-csv-${d.name}").toString
      writeCsv(sampleDf, d, dir)
      val back = spark.read
        .option("sep", d.delimiter.take(1))
        .option("nullValue", d.nullToken)
        .option("quote", "\"")
        .option("escape", "\"")
        .schema(canonicalize(sampleDf, d).schema)
        .csv(dir)
        .collect().sortBy(_.getInt(0))
      assert(back.length == 3, s"dialect ${d.name}")
      // quoted/comma/escaped content survives the round trip
      assert(back(0).getString(3) == "has, comma", s"dialect ${d.name}")
      assert(back(1).getString(1) == "bob \"quoted\"", s"dialect ${d.name}")
      // null column round-trips to null (via the dialect's null token)
      assert(back(2).isNullAt(1), s"dialect ${d.name}")
    }
  }

  test("writeCsv emits MsSql's FULL two-char field terminator (the " +
    "pre-r12 take(1) truncation collided '|' data with the separator)") {
    val dir = Files.createTempDirectory("graft-csv-mssql").toString
    // NULL note (representable as the empty null-token field) instead
    // of sampleDf's empty STRING (unrepresentable — see the loud-
    // failure test below)
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("active", BooleanType, nullable = true),
      StructField("note", StringType, nullable = true)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "alice", true, "has, comma"),
        Row(2, "bob \"quoted\"", false, null),
        Row(3, null, null, "plain")),
      schema)
    writeCsv(df, MsSql, dir)
    val lines = spark.read.text(dir).collect().map(_.getString(0)).sorted
    assert(lines.length == 3)
    // every row splits into exactly 4 fields on the FULL terminator
    lines.foreach { l =>
      assert(l.split(java.util.regex.Pattern.quote("|,"), -1).length == 4, l)
    }
    // bool canonicalized to 0/1; single '|' or ',' in data do not split
    assert(lines.exists(_.split(
      java.util.regex.Pattern.quote("|,"), -1).toSeq ==
      Seq("1", "alice", "1", "has, comma")), lines.mkString("\n"))
  }

  test("writeCsv fails LOUDLY on fields the no-quote BULK INSERT format " +
    "cannot represent: the terminator, a newline, and an empty string " +
    "colliding with the empty null token (r13 review)") {
    def fails(note: String): Unit = {
      val dir = Files.createTempDirectory("graft-csv-unrep").toString
      val schema = StructType(Seq(
        StructField("id", IntegerType, nullable = false),
        StructField("note", StringType, nullable = true)))
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(1, note)), schema)
      val e = intercept[Exception] { writeCsv(df, MsSql, dir) }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("unrepresentable")),
        s"note=<$note> raised without the contract message: $e")
    }
    fails("contains the |, terminator")
    fails("line\nbreak")
    fails("") // NULL vs '' collapse under nullToken = ""
  }

  test("jdbc bulk-load options select per-dialect batching (A5-A9)") {
    assert(jdbcOptions(MySql)("rewriteBatchedStatements") == "true")
    assert(jdbcOptions(Postgres)("reWriteBatchedInserts") == "true")
    assert(jdbcOptions(Oracle)("batchsize") == "10000")
  }
}
