package graft.etl



import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for SCALE.md §2: bucketing both sides of a standing join key
  * at ingest removes the per-query shuffle entirely — the layout-level
  * replacement for the reference's secondary indexes (E1).
  */
class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    (1L to 100L).map(i => (i, s"p$i")).toDF("o_id", "prio")
      .write.bucketBy(4, "o_id").sortBy("o_id").saveAsTable("b_orders")
    (1L to 300L).map(i => (i % 100 + 1, i.toDouble)).toDF("o_id", "price")
      .write.bucketBy(4, "o_id").sortBy("o_id").saveAsTable("b_lines")

    val joined = spark.table("b_lines").join(spark.table("b_orders"), "o_id")
      .groupBy("prio").agg(sum("price").as("rev"))
    // disable broadcast so the join strategy itself is under test
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val joinShuffles = "Exchange hashpartitioning\\(o_id".r
        .findAllMatchIn(plan).length
      assert(joinShuffles == 0,
        s"bucketed join must not re-shuffle on the join key:\n$plan")
      assert(joined.collect().length == 100)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
