package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaRulesSpec extends SparkSpec {

  test("rename / retype / delete / suffix rules compose (B2-B5)") {
    import spark.implicits._
    val df = Seq((1L, "x", 2.5, "drop-me", "2020"))
      .toDF("id", "name", "price", "junk", "created_dte")
    val out = SchemaRules(
      renames = Map("name" -> "label"),
      retypes = Map("price" -> DecimalType(10, 2)),
      deletes = Seq("junk"),
      suffixRenames = Map("_dte" -> "_date")).apply(df)
    assert(out.columns.toSeq == Seq("id", "label", "price", "created_date"))
    assert(out.schema("price").dataType == DecimalType(10, 2))
  }

  test("explicit rename wins over suffix rename; ignored suffixes drop (B5)") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("a_dte", "b_dte", "c_tmp")
    val r = SchemaRules(
      renames = Map("a_dte" -> "alpha"),
      suffixRenames = Map("_dte" -> "_date"),
      ignoredSuffixes = Seq("_tmp"))
    assert(r.apply(df).columns.toSeq == Seq("alpha", "b_date"))
  }

  test("CSV rule format parses to per-table rules (schema_transformer.py)") {
    val csv = Seq(
      "Table Name,Column Name,New Table Name,New Column Name,New Column Type,Delete",
      "orders,o_totalprice,,total_usd,,False",
      "orders,o_comment,,,,True",
      "orders,o_qty,,,INT,False",
      "lineitem,,line_items,,,False",
      "junk_table,,,,,True")
    val rules = SchemaRules.parseCsv(csv)
    assert(rules("orders").renames == Map("o_totalprice" -> "total_usd"))
    assert(rules("orders").deletes == Seq("o_comment"))
    assert(rules("orders").retypes("o_qty") == IntegerType)
    val tables = SchemaRules.parseTableRules(csv)
    assert(tables("lineitem").contains("line_items")) // B6 rename
    assert(tables("junk_table").isEmpty) // B7 delete
  }
}
