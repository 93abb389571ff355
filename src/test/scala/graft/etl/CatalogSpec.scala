package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.SaveMode

/** A10/A11 against the real session catalog: drop/recreate database,
  * managed-table create from schema, append to pre-existing table.
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("recreateDatabase drops managed tables and their data (A11)") {
    Catalog.recreateDatabase(spark, "graft_tgt")
    Catalog.writeTable(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      "graft_tgt", "t1")
    Catalog.writeTable(Seq((9L, 1.5)).toDF("id", "x"), "graft_tgt", "t2")
    assert(Catalog.tables(spark, "graft_tgt") == Seq("t1", "t2"))
    assert(spark.table("graft_tgt.t1").count() == 2)

    Catalog.recreateDatabase(spark, "graft_tgt") // clean slate
    assert(Catalog.tables(spark, "graft_tgt").isEmpty)
  }

  test("writeTable append is the pre-existing-table path (A10)") {
    Catalog.recreateDatabase(spark, "graft_tgt2")
    val df = Seq((1L, "a")).toDF("id", "v")
    Catalog.writeTable(df, "graft_tgt2", "t")
    Catalog.writeTable(Seq((2L, "b")).toDF("id", "v"), "graft_tgt2", "t",
      SaveMode.Append)
    assert(spark.table("graft_tgt2.t").count() == 2)
    // schema carried by the writer: the managed table reflects the df
    assert(spark.table("graft_tgt2.t").schema.fieldNames.toSeq == Seq("id", "v"))
    Catalog.recreateDatabase(spark, "graft_tgt2")
  }
}
