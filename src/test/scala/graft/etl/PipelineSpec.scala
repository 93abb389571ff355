package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("end-to-end migrate: profile, prune, narrow, transform, validate, report") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-src").toString
    val dst = Files.createTempDirectory("graft-dst").toString

    // parent / child with one orphan; child has an all-null column
    Seq((1L, "us"), (2L, "eu"))
      .toDF("region_id", "region_name")
      .write.mode("overwrite").parquet(s"$src/regions.parquet")
    Seq((10L, 1L, Option.empty[String], "A"),
        (11L, 2L, Option.empty[String], "B"),
        (12L, 99L, Option.empty[String], "C")) // orphan region 99
      .toDF("cust_id", "region_id", "ghost", "segment")
      .write.mode("overwrite").parquet(s"$src/custs.parquet")
    spark.emptyDataFrame.withColumn("x", org.apache.spark.sql.functions.lit(1))
      .limit(0).write.mode("overwrite").parquet(s"$src/void.parquet")

    val report = Pipeline.migrate(
      spark,
      Pipeline.SourceConfig(
        dir = src,
        skipTableIfEmpty = true,
        skipColumnIfEmpty = true,
        rules = Map("custs" -> SchemaRules(renames = Map("segment" -> "mkt_segment")))),
      outDir = dst,
      foreignKeys = Seq(
        Pipeline.ForeignKey("custs", "region_id", "regions", "region_id")))

    assert(report.skippedTables == Seq("void")) // B9
    val custs = spark.read.parquet(s"$dst/custs.parquet")
    assert(!custs.columns.contains("ghost")) // B8 all-null dropped
    assert(custs.columns.contains("mkt_segment")) // B2 rename applied
    // B1/C1: int64 data fitting int32 narrowed
    assert(custs.schema("cust_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(report.rowsMigrated == 5)
    assert(report.violatedFks.map(_.orphanCount) == Seq(1L)) // E2
    assert(report.render.contains("ORPHANS"))
  }

  test("reflectTables discovers parquet tables (A2)") {
    val d = Files.createTempDirectory("graft-reflect").toString
    import spark.implicits._
    Seq(1).toDF("a").write.parquet(s"$d/t1.parquet")
    Seq(2).toDF("b").write.parquet(s"$d/t2.parquet")
    assert(Pipeline.reflectTables(d) == Seq("t1", "t2"))
  }
}
