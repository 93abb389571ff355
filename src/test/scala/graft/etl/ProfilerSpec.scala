package graft.etl

import graft.SparkSpec
import org.scalatest.prop.TableDrivenPropertyChecks

class ProfilerSpec extends SparkSpec with TableDrivenPropertyChecks {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("ghost", StringType))) // all-null (B8 fodder)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "alpha", 1.5, null),
        Row(2L, "bee", null, null),
        Row(5000000000L, "gamma-longest", -2.5, null))),
      schema)
  }

  test("single-pass profile: counts, ranges, lengths, nulls (C1-C4)") {
    val p = Profiler.profile(df)
    assert(p.rowCount == 3)
    assert(p("id").nonNullCount == 3)
    assert(p("id").minNumeric.contains(1.0))
    assert(p("id").maxNumeric.contains(5.0e9))
    assert(p("name").maxLength.contains(13))
    assert(p("score").nonNullCount == 2)
    assert(p("ghost").nonNullCount == 0)
    assert(p("ghost").isAllNull(p.rowCount))
    assert(!p("score").isAllNull(p.rowCount))
  }

  test("empty table profiles to zero rows, nothing all-null (B9)") {
    val p = Profiler.profile(df.limit(0))
    assert(p.rowCount == 0)
    assert(!p("ghost").isAllNull(p.rowCount)) // zero rows != all-null column
  }

  test("nearestPowerOfTwo bounds (B10)") {
    val cases = Table(("n", "pow2"), (0, 1), (1, 1), (2, 2), (3, 4), (4, 4),
      (5, 8), (255, 256), (256, 256), (257, 512), (1000, 1024))
    forAll(cases) { (n, p) => assert(Profiler.nearestPowerOfTwo(n) == p) }
    // property: result is a power of two, >= n, and < 2n (for n >= 1)
    (1 to 4096).foreach { n =>
      val p = Profiler.nearestPowerOfTwo(n)
      assert(Integer.bitCount(p) == 1 && p >= n && p < 2 * math.max(n, 1))
    }
  }
}
