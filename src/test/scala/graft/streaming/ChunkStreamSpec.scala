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

  test("streaming ingest maintains the stored chunk table via " +
    "foreachBatch append — no refresh step, no staleness") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tag = "graft_test_chunkstream_maint_" + System.nanoTime()
    val standing = Seq((10L, a)).toDF("doc_id", "text")
    graft.ops.ChunkStore.buildOrLoad(spark, standing, tag)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-chunkmaint").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.ChunkStore.append(batch.sparkSession, batch, tag)
      }
      .start()
    try {
      input.addData((11L, a), (12L, b)) // 11 duplicates doc 10's chunks
      q.processAllAvailable()
      // foreachBatch wrote through a CLONED session; refresh this
      // session's cached file listing (same rule as SpanSet maintenance)
      spark.catalog.refreshTable(s"${tag}_chunks")
      // chunk rows are per-doc facts: append-then-read == rebuild — the
      // keepers relation sees the new duplicates immediately
      val keepers = graft.ops.ChunkStore.keepers(spark, tag)
      val dupFps = spark.table(s"${tag}_chunks")
        .groupBy("chunk_fp").count().filter($"count" >= 2)
      // doc 11's chunks all duplicate doc 10's; keeper = doc 10
      assert(dupFps.count() == 2) // both of doc 10's chunks re-ingested
      val k = keepers.join(dupFps, "chunk_fp").select("keeper_doc")
        .as[Long].collect().toSet
      assert(k == Set(10L))
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS ${tag}_chunks")
    }
  }
}
