package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL faces of the native expressions must agree with their Column
  * faces — same expression class underneath, so any drift means the
  * registration table wired a wrong builder.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.registerAll(spark)

  test("SQL functions resolve and match the Column API") {
    val df = Seq(("abcde", "bcdef")).toDF("a", "b")
    df.createOrReplaceTempView("ge_t")
    val sqlRow = spark.sql(
      """SELECT graft_jaccard(graft_char_shingles(a, 3),
        |                     graft_char_shingles(b, 3)) AS j
        |FROM ge_t""".stripMargin).as[Double].head()
    val colRow = df.select(
      TextFunctions.jaccard(TextFunctions.charShingles(col("a"), 3),
        TextFunctions.charShingles(col("b"), 3)).as("j"))
      .as[Double].head()
    assert(sqlRow == colRow)
    // 3-shingles: abcde -> {abc,bcd,cde}, bcdef -> {bcd,cde,def};
    // intersection 2, union 4
    assert(sqlRow == 0.5)
  }

  test("graft_dot from SQL equals the native DotProduct column") {
    val df = Seq((Array(1d, 2d, 3d), Array(4d, 5d, 6d))).toDF("a", "b")
    df.createOrReplaceTempView("ge_v")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM ge_v")
      .as[Double].head()
    assert(got == 32.0)
  }

  test("graft_minhash_bands in SQL yields the configured band count") {
    val df = Seq(Tuple1("the quick brown fox jumps over the lazy dog"))
      .toDF("t")
    df.createOrReplaceTempView("ge_m")
    val n = spark.sql(
      """SELECT size(graft_minhash_bands(
        |  graft_char_shingles(t, 5), 3, 4)) AS n FROM ge_m""".stripMargin)
      .as[Int].head()
    assert(n == 3)
  }

  test("non-literal width parameter is rejected with a clear error") {
    val df = Seq(("abc", 2)).toDF("s", "k")
    df.createOrReplaceTempView("ge_e")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_char_shingles(s, k) FROM ge_e").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
