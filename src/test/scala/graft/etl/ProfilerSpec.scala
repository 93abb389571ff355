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

  test("merge(profile(a), profile(b)) == profile(a union b) — incremental " +
    "profiling scans only the batch") {
    // random split of a random table: the semilattice merge must equal a
    // full rescan exactly, for every statistic
    val rnd = new scala.util.Random(11)
    val schema = StructType(Seq(
      StructField("n", LongType),
      StructField("s", StringType)))
    def rows(k: Int) = (1 to k).map { _ =>
      Row(
        if (rnd.nextInt(5) == 0) null else rnd.nextLong() % 1000000L,
        if (rnd.nextInt(5) == 0) null else "x" * (1 + rnd.nextInt(30)))
    }
    val a = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(40)), schema)
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(rows(25)), schema)
    val merged = Profiler.merge(Profiler.profile(a), Profiler.profile(b))
    val full = Profiler.profile(a.union(b))
    assert(merged == full)
    // an empty batch is the merge identity
    assert(Profiler.merge(full, Profiler.profile(a.union(b).limit(0))) == full)
    // mismatched schemas must fail loudly, not silently drop columns
    intercept[IllegalArgumentException] {
      Profiler.merge(full, Profiler.profile(a.drop("s")))
    }
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
