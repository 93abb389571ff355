package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class ChunkStreamSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val a = (1 to 40).map(i => s"w$i").mkString(" ")
  private val b = (101 to 140).map(i => s"w$i").mkString(" ")

  test("embeddedChunkHits flags arriving chunks whose embedding already " +
    "exists, and matches the batch probe on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((10L, a), (11L, b)).toDF("doc_id", "text")
    val tag = "graft_test_chunkstream_" + System.nanoTime()
    val keepers = CorpusStream.buildChunkStore(spark, corpus, tag)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = CorpusStream.embeddedChunkHits(
      input.toDF().toDF("eventTime", "doc_id", "text"), keepers)
      .writeStream.queryName("chunk_probe_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-chunk").toString)
      .format("memory")
      .start()
    try {
      val arriving = Seq(
        (ts("2024-01-01 10:00:00"), 1L, a), // re-ingest of doc 10's text
        (ts("2024-01-01 10:00:10"), 2L,
          (201 to 240).map(i => s"w$i").mkString(" "))) // fresh
      input.addData(arriving: _*)
      q.processAllAvailable()
      val out = spark.table("chunk_probe_test")
        .orderBy("doc_id", "chunk_idx").collect()
      // doc 1's two chunks hit doc 10's stored embeddings; doc 2 misses
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 1L))
      assert(out.forall(_.getAs[Long]("keeper_doc") == 10L))
      // stream == batch differential: the same rows through the batch
      // join (one chunker, one keeper relation — nothing can drift)
      val batch = CorpusStream.embeddedChunkHits(
        arriving.toDF("eventTime", "doc_id", "text"), keepers)
        .orderBy("doc_id", "chunk_idx").collect()
      assert(out.toSeq == batch.toSeq)
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS ${tag}_chunks")
    }
  }
}
