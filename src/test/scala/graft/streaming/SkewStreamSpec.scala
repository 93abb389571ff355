package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class SkewStreamSpec extends SparkSpec {

  // Zipf-ish keyed stream: key 1 dominates, mid keys moderate, long tail
  // of singletons — split across two triggers so state must carry counts
  // over the batch boundary to stay exact.
  private val batch1: Seq[Long] =
    Seq.fill(40)(1L) ++ Seq.fill(9)(2L) ++ Seq.fill(5)(3L) ++ (10L to 29L)
  private val batch2: Seq[Long] =
    Seq.fill(25)(1L) ++ Seq.fill(8)(2L) ++ Seq.fill(4)(4L) ++ (30L to 44L)

  test("keyCounts maintains exact per-key counts across triggers and the " +
    "summarized snapshot equals the batch skew profile on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    import spark.implicits._
    val input = MemoryStream[Long]
    val q = SkewStream.keyCounts(input.toDF().toDF("k"))
      .writeStream.queryName("skew_counts_test")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-skew").toString)
      .format("memory")
      .start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      // Update sink holds one row per (key, trigger-that-updated-it);
      // counts are monotone per key, so max(cnt) is the final state.
      val streamCounts = spark.table("skew_counts_test")
        .groupBy("k").agg(org.apache.spark.sql.functions.max("cnt").as("cnt"))
      val all = (batch1 ++ batch2).toDF("k")
      val batchCounts = all.groupBy("k")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      // per-key exactness
      assert(streamCounts.orderBy("k").collect().toSeq ==
        batchCounts.orderBy("k").collect().toSeq)
      // stream == batch differential on the shared summary reduction:
      // identical 9 metric rows (n/max/percentiles/skew/top1)
      val sSum = SkewStream.summarize(streamCounts).collect().toSeq
      val bSum = SkewStream.summarize(batchCounts).collect().toSeq
      assert(sSum == bSum)
      // spot-check the profile itself: key 1 is the hot key
      val m = sSum.map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(m("top1_key") == 1.0 && m("top1_cnt") == 65.0)
      assert(m("n_rows") == (batch1.size + batch2.size).toDouble)
      assert(m("max_cnt") == 65.0 && m("p50_cnt") == 1.0)
      assert(m("skew_factor") > 1.0)
    } finally q.stop()
  }
}
