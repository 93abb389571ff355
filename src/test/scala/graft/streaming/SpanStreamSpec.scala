package graft.streaming

import graft.SparkSpec
import graft.ops.SpanDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class SpanStreamSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("boilerplateHits flags arriving docs carrying corpus-duplicated spans") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // batch corpus: docs 10/11 share their first 9 tokens -> 2 duplicated
    // 8-gram spans; doc 12 is disjoint. The stream probes the STORED
    // SpanSet artifact (bucketed tables), not an in-memory derivation —
    // the same read path the batch queries use.
    val corpus = Seq(
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine zzz"),
      (12L, "aa bb cc dd ee ff gg hh ii jj"))
      .toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
    val dupSpans = CorpusStream.buildSpanSet(spark, corpus,
      "graft_test_spanstream_" + System.nanoTime())
    // the in-memory derivation and the stored artifact agree
    assert(dupSpans.collect().map(_.getString(0)).sorted.toSeq ==
      SpanDedup.duplicatedSpanSet(corpus)
        .collect().map(_.getString(0)).sorted.toSeq)
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = CorpusStream.boilerplateHits(
      input.toDF().toDF("eventTime", "doc_id", "text"), dupSpans)
      .writeStream.queryName("span_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-span").toString)
      .format("memory")
      .start()
    try {
      input.addData(
        // carries BOTH duplicated spans (tokens 1..9 of the shared run)
        (ts("2024-01-01 10:00:00"), 1L,
          "one two three four five six seven eight nine"),
        // fresh text -> no hits
        (ts("2024-01-01 10:00:10"), 2L,
          "completely different words entirely unrelated content here today ok"))
      q.processAllAvailable()
      val out = spark.table("span_test").orderBy("doc_id", "sh").collect()
      assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 1L))
      // 9 tokens -> 2 distinct 8-gram spans, both duplicated in the corpus
      assert(out.forall(_.getAs[Int]("n_spans") == 2))
    } finally q.stop()
  }

  test("scrubBatch rewrites arriving docs against the standing dup-span " +
    "set, identical to the batch scrub of the same docs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq(
      (10L, "one two three four five six seven eight nine ten"),
      (11L, "one two three four five six seven eight nine zzz"))
      .toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
    val dupSpans = CorpusStream.buildSpanSet(spark, corpus,
      "graft_test_scrubstream_" + System.nanoTime())
    val arriving = Seq(
      // carries the corpus's duplicated 9-token run + a unique tail
      (1L, "one two three four five six seven eight nine fresh tail words"),
      // fresh text: untouched
      (2L, "completely different words entirely unrelated content here today"))
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-scrub").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = CorpusStream.scrubBatch(b, dupSpans)
          .select("doc_id", "n_tokens", "n_removed", "scrubbed_text")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        sink.synchronized { sink ++= out }
        ()
      }
      .start()
    try {
      input.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = sink.synchronized(sink.toSeq).sortBy(_._1)
      // differential: identical to the batch rewrite of the same docs
      val expect = SpanDedup.scrubbed(
          arriving.toDF("doc_id", "text"), dupSpans)
        .select("doc_id", "n_tokens", "n_removed", "scrubbed_text")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSeq.sortBy(_._1)
      assert(streamed == expect)
      // the duplicated run (tokens 0..8) is removed, the fresh tail kept
      assert(streamed.head == ((1L, 12L, 9L, "fresh tail words")))
      assert(streamed(1)._3 == 0L) // fresh doc untouched
    } finally q.stop()
  }

  test("charBoilerplateHits flags arriving docs carrying corpus-duplicated " +
    "character runs via the stored charspans artifact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 59-char verbatim run shared by corpus docs 10/11 (>= the 47-char
    // winnow guarantee, so both docs select >= 1 common fingerprint ->
    // duplicated); doc 12 disjoint. Alphabet/content chosen fully ASCII.
    val run = "the same boilerplate disclaimer sentence repeated verbatim!"
    assert(run.length >= 47, "fixture must clear the winnow guarantee")
    val corpus = Seq(
      (10L, s"intro text alpha $run trailing alpha words"),
      (11L, s"different beginning $run other ending entirely"),
      (12L, "a fully unrelated document with no shared character runs at all"))
      .toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
    val dupFps = CorpusStream.buildCharSpanSet(spark, corpus,
      "graft_test_charspanstream_" + System.nanoTime())
    assert(dupFps.count() >= 1,
      "shared 60-char run must yield >= 1 duplicated winnow fingerprint")
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    val q = CorpusStream.charBoilerplateHits(
      input.toDF().toDF("eventTime", "doc_id", "text"), dupFps)
      .writeStream.queryName("charspan_test")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-charspan").toString)
      .format("memory")
      .start()
    try {
      input.addData(
        // carries the boilerplate run -> the guarantee promises >= 1 hit
        (ts("2024-01-01 10:00:00"), 1L, s"stream prefix $run stream suffix"),
        // fresh text, long enough to winnow -> no hits
        (ts("2024-01-01 10:00:10"), 2L,
          "completely different words entirely unrelated content here today"))
      q.processAllAvailable()
      val out = spark.table("charspan_test").collect()
      assert(out.nonEmpty && out.forall(_.getAs[Long]("doc_id") == 1L),
        "only the boilerplate-carrying doc may hit")
    } finally q.stop()
  }

  test("streaming ingest maintains the stored span artifact via foreachBatch append") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    // standing corpus: one doc; the stream delivers a near-copy whose
    // spans straddle standing + batch, then maintenance runs. This is
    // the artifact's documented ingest lifecycle (append = sum-lattice
    // count deltas that reads merge exactly, refresh = compaction)
    // driven from Structured Streaming — foreachBatch is the sanctioned
    // sink for maintaining bucketed tables a stream cannot write
    // directly.
    val tag = "graft_test_spanstream_maint_" + System.nanoTime()
    val standing = Seq(
      (10L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text").withColumn("source", lit("s0"))
    graft.ops.SpanSet.buildOrLoad(spark, standing, tag)
    assert(graft.ops.SpanSet.duplicatedSpans(spark, tag).count() == 0)
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .withColumn("source", lit("stream"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-spanmaint").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.SpanSet.append(batch.sparkSession, batch, tag)
      }
      .start()
    try {
      input.addData((11L, "one two three four five six seven eight nine zzz"))
      q.processAllAvailable()
      // foreachBatch wrote through a CLONED session; this session's
      // cached file listing for the tables is stale until refreshed
      // (same rule as any cross-session writer of a catalog table).
      Seq(s"${tag}_spanrows", s"${tag}_spanset")
        .foreach(spark.catalog.refreshTable)
      // appended rows landed, and the straddling spans surface
      // IMMEDIATELY: the batch's delta counts sum with the standing
      // rows past the threshold at read (the r7 exact-append change)
      assert(spark.table(s"${tag}_spanrows").count() == 6)
      assert(graft.ops.SpanSet.duplicatedSpans(spark, tag).count() == 2)
      // compaction folds the deltas away without changing any answer
      graft.ops.SpanSet.refreshSpanCounts(spark, tag)
      assert(graft.ops.SpanSet.duplicatedSpans(spark, tag).count() == 2)
    } finally {
      q.stop()
      Seq(s"${tag}_spanrows", s"${tag}_spanset").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
