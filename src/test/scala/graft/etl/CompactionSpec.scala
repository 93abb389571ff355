package graft.etl

import java.nio.file.Files

import graft.SparkSpec

class CompactionSpec extends SparkSpec {

  test("compaction rewrites a many-small-files dir to ~targetBytes files, preserving rows") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-compact-src").toString
    val dst = Files.createTempDirectory("graft-compact-dst").toString
    // fragment the documents table into 40 small files
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .repartition(40)
      .write.mode("overwrite").parquet(src)
    val before = spark.read.parquet(src)
    val rows = before.count()
    val report = Compaction.compact(spark, src, dst,
      sortKey = "doc_id", targetBytes = 64L * 1024 * 1024)
    assert(report.filesBefore == 40)
    // everything fits one 64 MB target file
    assert(report.filesAfter == 1, s"got ${report.filesAfter} files")
    val after = spark.read.parquet(dst)
    assert(after.count() == rows)
    // same content, not just same cardinality
    assert(after.select("doc_id").except(before.select("doc_id")).isEmpty)
  }

  test("compaction splits output at targetBytes and keeps range clustering") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-compact-src2").toString
    val dst = Files.createTempDirectory("graft-compact-dst2").toString
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .repartition(25)
      .write.mode("overwrite").parquet(src)
    val srcBytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = srcBytes / 3 // force ~3-4 output files
    val report = Compaction.compact(spark, src, dst,
      sortKey = "l_orderkey", targetBytes = target)
    assert(report.filesAfter >= 3 && report.filesAfter <= 5,
      s"expected ~4 files, got ${report.filesAfter}")
    // range clustering: per-file [min,max] l_orderkey intervals must not
    // overlap (this is what keeps min/max stats selective post-compaction)
    val perFile = spark.read.parquet(dst)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        $"l_orderkey")
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("l_orderkey").as("lo"),
        org.apache.spark.sql.functions.max("l_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"file ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }
}
