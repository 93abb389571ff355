package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Proves the layout operators actually prune — the E1 index→layout
  * mapping as measured behavior, not advice.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = (0 until 1000).map { i =>
    (i.toLong, f"2024-${1 + i % 4}%02d", i % 50, i * 1.5)
  }.toDF("event_id", "month", "bucket_key", "value")

  test("partitionBy layout: an equality filter lists only matching dirs") {
    val path = Files.createTempDirectory("layout-part").toString + "/t"
    Layout.writePartitioned(events, "month", path)
    val all = Layout.filesRead(spark, path, "true")
    val one = Layout.filesRead(spark, path, "month = '2024-01'")
    assert(all.length > one.length && one.nonEmpty)
    assert(one.forall(_.contains("month=2024-01")))
    // the filter must be a PartitionFilter (pruned at listing time),
    // visible in the executed plan text
    val plan = spark.read.parquet(path).filter("month = '2024-01'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"))
  }

  test("range-sorted layout: row-group stats make ranges disjoint per file") {
    val path = Files.createTempDirectory("layout-sort").toString + "/t"
    Layout.writeSorted(events, Seq("event_id"), path, numFiles = 4)
    // per-file min/max of the sort column must not overlap across files
    val perFile = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("event_id"))
      .groupBy("f").agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .orderBy("lo").collect()
    assert(perFile.length == 4)
    val ranges = perFile.map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
    // and the range predicate reaches parquet as a pushed filter
    val plan = spark.read.parquet(path).filter("event_id >= 900")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(event_id), GreaterThanOrEqual(event_id,900)]"))
  }

  test("zValue interleaves bits: a at odd positions, b at even") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (2L, 3L), (3L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=2 (bit1 -> pos3 = 8), b=3 (bit0 -> pos0 = 1, bit1 -> pos2 = 4)
    assert(rows == Seq(0L, 2L, 1L, 3L, 8L, 13L, 15L))
  }

  test("z-ordered layout survives nanosecond-timestamp-scale ranges " +
    "(no long overflow in the grid scaling)") {
    // Column ranges wider than Long.MaxValue / gmax (~2.25e15 at
    // 12 bits): a long-arithmetic (c - lo) * gmax wraps and garbles the
    // z-values. 100 days of nanosecond timestamps x a wide id space,
    // correlated so pruning is possible when (and only when) the
    // scaling is exact.
    val dayNs = 86400L * 1000 * 1000 * 1000
    val base = 1700000000L * 1000 * 1000 * 1000
    val wide = (0 until 10000).map { i =>
      (base + (i / 100).toLong * dayNs, (i % 100).toLong * 1000000L)
    }.toDF("ts", "k")
    val path = Files.createTempDirectory("layout-zwide").toString + "/t"
    Layout.writeZOrdered(wide, "ts", "k", path, numFiles = 16)
    val all = Layout.filesRead(spark, path, "true").length
    // a ~10% slice on EACH dimension prunes: with the overflow, the
    // z-order degenerates to noise and every file spans every range
    val zt = Layout.filesRead(spark, path,
      s"ts < ${base + 10 * dayNs}").length
    val zk = Layout.filesRead(spark, path, "k < 10000000").length
    assert(zt <= all / 2, s"ts-slice touched $zt of $all files")
    assert(zk <= all / 2, s"k-slice touched $zk of $all files")
  }

  test("z-ordered layout survives FULL-range long columns (range wider " +
    "than Long.MaxValue: offset and divisor both exceed long math)") {
    // min near Long.MinValue with positive max: (c - lo) wraps in long
    // arithmetic and (hi - lo) wraps in driver Long math — the r6
    // ADVICE finding. Values must flow through Decimal/BigDecimal end
    // to end for the grid scaling to stay monotone.
    val span = BigInt(Long.MaxValue) - BigInt(Long.MinValue)
    def at(frac: Int, of: Int): Long =
      (BigInt(Long.MinValue) + span * frac / of).toLong
    val full = (0 until 10000)
      .map(i => (at(i / 100, 100), at(i % 100, 100)))
      .toDF("x", "y")
    val path = Files.createTempDirectory("layout-zfull").toString + "/t"
    Layout.writeZOrdered(full, "x", "y", path, numFiles = 16)
    val all = Layout.filesRead(spark, path, "true").length
    val zx = Layout.filesRead(spark, path, s"x < ${at(10, 100)}").length
    val zy = Layout.filesRead(spark, path, s"y < ${at(10, 100)}").length
    assert(zx <= all / 2, s"x-slice touched $zx of $all files")
    assert(zy <= all / 2, s"y-slice touched $zy of $all files")
  }

  test("z-ordered layout: selective filters on EITHER dimension touch " +
    "few files; single-column sort only prunes its own dimension") {
    // 100x100 grid, both dims uniform and independent
    val grid = (0 until 10000).map(i => (i.toLong, (i % 100).toLong, (i / 100).toLong))
      .toDF("id", "x", "y")
    val zPath = Files.createTempDirectory("layout-z").toString + "/t"
    val sPath = Files.createTempDirectory("layout-s").toString + "/t"
    Layout.writeZOrdered(grid, "x", "y", zPath, numFiles = 16)
    Layout.writeSorted(grid, Seq("x"), sPath, numFiles = 16)

    val all = Layout.filesRead(spark, zPath, "true").length
    assert(all == 16)
    // a 10%-selective slice on each dimension: the Z tiling bounds BOTH
    // dims per file, so each slice intersects a strict subset of files
    val zx = Layout.filesRead(spark, zPath, "x < 10").length
    val zy = Layout.filesRead(spark, zPath, "y < 10").length
    assert(zx <= all / 2, s"x-slice touched $zx of $all z-ordered files")
    assert(zy <= all / 2, s"y-slice touched $zy of $all z-ordered files")
    // the x-sorted layout prunes x but its y stats span everything
    val sx = Layout.filesRead(spark, sPath, "x < 10").length
    val sy = Layout.filesRead(spark, sPath, "y < 10").length
    assert(sx <= all / 2)
    assert(sy == 16, s"y-slice should touch every x-sorted file, got $sy")
  }
}
