package graft.streaming

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // three labels of 4-dim float vectors, split across two triggers so
  // state must carry (count, decimal sum) over the batch boundary; the
  // values exercise non-trivial decimal expansions (floats like 0.1f
  // have long exact binary->decimal forms)
  private val vecs: Seq[(Long, Seq[Float], Int)] = Seq(
    (1L, Seq(1.0f, 0.1f, 0.0f, 0.25f), 0),
    (2L, Seq(0.0f, 0.9f, 0.2f, 0.0f), 0),
    (3L, Seq(0.0f, 0.0f, 1.0f, 0.3f), 1),
    (4L, Seq(0.1f, 0.0f, 0.0f, 0.7f), 1),
    (5L, Seq(0.5f, 0.5f, 0.1f, 0.0f), 2),
    (6L, Seq(0.7f, 0.3f, 0.0f, 0.1f), 2),
    (7L, Seq(0.2f, 0.2f, 0.2f, 0.2f), 0))
  private val (batch1, batch2) = vecs.splitAt(4)

  test("streamed per-label moments reproduce the declared batch drift " +
    "matrix exactly (stream == batch differential)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    // batch side: the declared query over the same vectors as parquet
    val dir = Files.createTempDirectory("graft-driftstream").toString
    vecs.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val expected = Registry.queryMap("q_embedding_drift")(spark, dir)
      .collect().toSeq

    // stream side: same values as (label, v double) rows, two triggers
    val input = MemoryStream[(Int, Seq[Double])]
    val q = DriftStream.labelMoments(input.toDF().toDF("label", "v"))
      .writeStream.queryName("drift_moments_test")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-drift").toString)
      .format("memory")
      .start()
    try {
      input.addData(batch1.map(t => (t._3, t._2.map(_.toDouble))): _*)
      q.processAllAvailable()
      input.addData(batch2.map(t => (t._3, t._2.map(_.toDouble))): _*)
      q.processAllAvailable()
      val got = DriftStream.summarize(spark.table("drift_moments_test"))
        .collect().toSeq
      assert(got == expected,
        s"stream matrix != batch matrix\nstream: $got\nbatch:  $expected")
    } finally q.stop()
  }
}
