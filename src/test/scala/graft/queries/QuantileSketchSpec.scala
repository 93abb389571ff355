package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backs q_quantile_profile's 100 TB claim ("swap percentile ->
  * percentile_approx — same plan shape, bounded memory") with a measured
  * number: the sketch's error against the exact interpolated quantile on
  * real testdata, and the plan fact that the sketch aggregates
  * map-side-partial (mergeable — the property that bounds memory at any
  * scale, where exact percentile must buffer every value per group).
  */
class QuantileSketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("percentile_approx tracks exact quartiles within 1% on lineitem " +
    "and aggregates as a mergeable partial") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val agg = li.groupBy("l_returnflag").agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("approx_p50"),
      percentile(col("l_extendedprice"), lit(0.95)).as("exact_p95"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
        .as("approx_p95"))
    agg.collect().foreach { r =>
      for ((e, a) <- Seq(("exact_p50", "approx_p50"), ("exact_p95", "approx_p95"))) {
        val exact = r.getAs[Double](e)
        val approx = r.getAs[Double](a)
        val relErr = math.abs(approx - exact) / math.abs(exact)
        assert(relErr < 0.01,
          s"flag=${r.get(0)} $a=$approx vs $e=$exact relErr=$relErr")
      }
    }
    // mergeable map-side partial: the sketch appears in a partial
    // ObjectHashAggregate below the exchange, not only in the final agg
    val planTxt = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)))
      .queryExecution.executedPlan.toString
    assert(planTxt.contains("ObjectHashAggregate") &&
      planTxt.contains("partial_percentile_approx"),
      s"expected a partial sketch aggregate in:\n$planTxt")
  }

  test("q_quantile_sketch: exact column matches the closed form on a " +
    "planted uniform domain; sample estimate is layout-invariant") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("qsketch").toString
    // 1000 docs, doc i has exactly i tokens -> type-1 q(p) = (p*1000+99)//100
    (1L to 1000L).map(i => (i, (1L to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val df = graft.Registry.queryMap("q_quantile_sketch")(spark, d)
    val asStrings = df.collect().map(_.toString).toSeq
    val rows = df.as[(Int, Long, Long, Long, Double, Double)].collect()
    val byP = rows.map(r => r._1 -> r).toMap
    for (p <- Seq(25, 50, 75, 90, 99)) {
      assert(byP(p)._2 == (p * 1000L + 99) / 100, s"exact q($p)")
      assert(byP(p)._4 == 256L, "sample_n")
      // K=256 hash sample: rank error stays well inside 3/sqrt(K)~0.19;
      // the sample is DETERMINISTIC so this is a stable pin, not a flake
      assert(byP(p)._6 <= 0.19, s"rank_err($p)=${byP(p)._6}")
    }
    // min-k distributivity: identical output under different ambient
    // parallelism (the merged sample must be bit-identical)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = graft.Registry.queryMap("q_quantile_sketch")(spark, d)
        .collect().map(_.toString).toSeq
      assert(again == asStrings)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
