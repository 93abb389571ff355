package graft.streaming

import graft.SparkSpec
import graft.ops.{PackingQueries, SampleQueries}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming packed-artifact face: packing the real sf0.001 permutation
  * stream across THREE micro-batches (state must carry open buffers over
  * every boundary) plus a flush sentinel reproduces the batch
  * `packedSequences` relation row for row — same sequence ids, token
  * counts, padding, doc counts, first docs, and stream fingerprints —
  * including the only-last-sequence-padded invariant. Out-of-order
  * ingest is rejected, not mis-packed.
  */
class PackStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("stream packing == batch packedSequences across micro-batch " +
    "boundaries (sf0.001, 3 triggers + flush)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val docs = graft.Tables.t(spark, sf, "documents")
    val perm = SampleQueries.shuffleShardPerm(docs)
      .select("shard", "pos", "doc_id", "text")
    val budget = PackingQueries.ArtifactBudget
    val expected = PackingQueries
      .packedSequences(SampleQueries.shuffleShardPerm(docs), budget)
      .select("shard", "seq_id", "n_tokens", "n_pad", "n_docs",
        "first_doc", "seq_fp")
      .as[(Int, Long, Long, Long, Long, Long, String)]
      .collect().toSet

    // per-shard position order preserved across triggers: cut by pos
    val rows = perm.as[(Int, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2))
    val b1 = rows.filter(_._2 <= 10L)
    val b2 = rows.filter(r => r._2 > 10L && r._2 <= 20L)
    val b3 = rows.filter(_._2 > 20L)
    assert(b1.nonEmpty && b2.nonEmpty && b3.nonEmpty,
      "all three triggers must carry rows for the boundary test to bite")
    val flush = rows.map(_._1).distinct
      .map(sh => (sh, Long.MaxValue, PackStream.FlushDocId, null: String))

    val input = MemoryStream[(Int, Long, Long, String)]
    val q = PackStream
      .packStream(input.toDF().toDF("shard", "pos", "doc_id", "text"), budget)
      .writeStream.queryName("pack_stream_test")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-pack").toString)
      .format("memory")
      .start()
    try {
      Seq(b1, b2, b3, flush).foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val got = spark.table("pack_stream_test")
        .select("shard", "seq_id", "n_tokens", "n_pad", "n_docs",
          "first_doc", "seq_fp")
        .as[(Int, Long, Long, Long, Long, Long, String)]
        .collect().toSet
      assert(got == expected,
        s"stream != batch: missing=${(expected -- got).take(3)} " +
          s"extra=${(got -- expected).take(3)}")
      // the padded-sequence set is exactly one per shard (the last)
      val padded = got.filter(_._4 > 0).groupBy(_._1)
      assert(padded.values.forall(_.size == 1) || padded.isEmpty)
    } finally q.stop()
  }

  test("out-of-order ingest is rejected (position-regression guard)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val input = MemoryStream[(Int, Long, Long, String)]
    val q = PackStream
      .packStream(input.toDF().toDF("shard", "pos", "doc_id", "text"), 8)
      .writeStream.queryName("pack_stream_ooo")
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-pack2").toString)
      .format("memory")
      .start()
    try {
      input.addData((0, 5L, 1L, "a b c"))
      q.processAllAvailable()
      input.addData((0, 3L, 2L, "d e f")) // regression: pos 3 after 5
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(ex.getMessage != null)
    } finally q.stop()
  }
}
