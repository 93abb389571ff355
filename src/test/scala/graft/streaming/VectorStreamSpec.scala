package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VectorStreamSpec extends SparkSpec {

  test("streaming ANN probe against the stored IVF index matches the " +
    "batch probe for the same vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // stored index built once, batch-side (16 cells at tiny scale)
    val tag = graft.ops.IvfIndex.tag(dir, 16)
    graft.ops.IvfIndex.buildOrLoad(spark, dir, 16)
    // two query vectors taken from the corpus itself (so neighbors exist)
    val probes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id").isin(25L, 50L))
      .as[(Long, Seq[Double])].collect().toSeq
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "v")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-vec").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = VectorStream.annProbeBatch(b.sparkSession, b, tag)
          .select("query_id", "rank", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        sink.synchronized { sink ++= out }
        ()
      }
      .start()
    try {
      input.addData(probes: _*)
      q.processAllAvailable()
      val streamed = sink.synchronized(sink.toSeq).sorted
      assert(streamed.nonEmpty, "probe produced no candidates")
      // differential: identical to the batch probe over the same vectors
      val batchQ = spark.createDataset(probes).toDF("vec_id", "v")
      val expect = VectorStream.annProbeBatch(spark, batchQ, tag)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq.sorted
      assert(streamed == expect)
      // redelivery detection (r12): the probe targets a STANDING index,
      // so a probe vector already IN the index surfaces its stored twin
      // at rank 1 — the at-least-once duplicate check this face exists
      // to support (excludeSelf=false; the batch self-join keeps true)
      Seq(25L, 50L).foreach { qid =>
        assert(streamed.contains((qid, 1, qid)),
          s"stored twin of redelivered $qid must rank first: $streamed")
      }
    } finally q.stop()
  }

  test("streaming IVFADC composed probe (stored cells gate stored codes) " +
    "matches the batch composition for the same vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // both stored artifacts built once, batch-side
    val ivfTag = graft.ops.IvfIndex.tag(dir, 16)
    graft.ops.IvfIndex.buildOrLoad(spark, dir, 16)
    val pqTag = graft.ops.PqStore.tag(dir)
    graft.ops.PqStore.buildOrLoad(spark, dir)
    val probes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id").isin(25L, 50L))
      .as[(Long, Seq[Double])].collect().toSeq
    val sink = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Long, Double)]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "v")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-ivfpq").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = VectorStream.ivfPqProbeBatch(b.sparkSession, b, ivfTag, pqTag)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        sink.synchronized { sink ++= out }
        ()
      }
      .start()
    try {
      input.addData(probes: _*)
      q.processAllAvailable()
      val streamed = sink.synchronized(sink.toSeq).sorted
      assert(streamed.nonEmpty, "composed probe produced no candidates")
      // differential: identical to the batch composition over the same
      // vectors
      val batchQ = spark.createDataset(probes).toDF("vec_id", "v")
      val expect = VectorStream.ivfPqProbeBatch(spark, batchQ, ivfTag, pqTag)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      assert(streamed == expect)
      // the gate is real: every ADC-scored neighbor lies in a probed
      // cell of its query (candidates came through the cell join, never
      // a flat scan)
      val cells = spark.table(s"${ivfTag}_ivfcells")
        .select("vec_id", "cell")
        .collect()
        .map(r => r.getLong(0) -> r.getAs[Number](1).intValue).toMap
      val cents = spark.table(s"${ivfTag}_ivfcentroids")
      val probed = graft.ops.SimilarityQueries
        .probeCellsForTest(
          spark.createDataset(probes).toDF("vec_id", "v")
            .withColumn("qn", sqrt(graft.functions.VectorFunctions
              .dot(col("v"), col("v"))))
            .select(col("vec_id").as("query_id"), col("v").as("qv"),
              col("qn")),
          cents, 4)
        .select("query_id", "cell")
        .collect().map(r => r.getLong(0) -> r.getAs[Number](1).intValue)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      streamed.foreach { case (qid, _, n, _) =>
        assert(probed(qid).contains(cells(n)),
          s"neighbor $n of query $qid not in a probed cell")
      }
      // redelivery detection (r12): the stored twin of an already-
      // indexed probe id is a legitimate (ADC-scored) candidate
      Seq(25L, 50L).foreach { qid =>
        assert(streamed.exists { case (q2, _, n, _) => q2 == qid && n == qid },
          s"stored twin of redelivered $qid absent: $streamed")
      }
    } finally q.stop()
  }

  test("streaming HYBRID retrieval (lex + IVFADC + RRF against the " +
    "standing stores) matches the batch call for the same queries, " +
    "equals a pure-Scala RRF of the two legs' own outputs, and " +
    "surfaces the stored twin of a query equal to a standing doc") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val ivfTag = graft.ops.IvfIndex.tag(dir, 16)
    graft.ops.IvfIndex.buildOrLoad(spark, dir, 16)
    val pqTag = graft.ops.PqStore.tag(dir)
    graft.ops.PqStore.buildOrLoad(spark, dir)
    val lexTag = graft.ops.LexIndex.tag(dir)
    graft.ops.LexIndex.buildOrLoad(spark,
      graft.Tables.par(spark, dir, "documents"), lexTag)
    // arriving queries = (id, text, embedding) twins of standing docs
    // 25 and 50 — a production request carries both forms
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id").isin(25L, 50L))
    val queries = emb
      .join(spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("vec_id"), col("text")), "vec_id")
      .select(col("vec_id").as("query_id"), col("text"), col("v"))
      .as[(Long, String, Seq[Double])].collect().toSeq
    assert(queries.size == 2)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
    val input = MemoryStream[(Long, String, Seq[Double])]
    val q = input.toDF().toDF("query_id", "text", "v")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-hybrid").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = VectorStream
          .hybridRetrieveBatch(spark, b, lexTag, ivfTag, pqTag)
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        sink.synchronized { sink ++= out }
        ()
      }
      .start()
    try {
      // one query per micro-batch — the stateless-given-frozen-stores
      // claim is exactly that the split cannot matter
      queries.foreach { qr =>
        input.addData(qr)
        q.processAllAvailable()
      }
      val streamed = sink.synchronized(sink.toSeq).sorted
      assert(streamed.nonEmpty)
      val batchQ = spark.createDataset(queries).toDF("query_id", "text", "v")
      val expect = VectorStream
        .hybridRetrieveBatch(spark, batchQ, lexTag, ivfTag, pqTag)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSeq.sorted
      assert(streamed == expect, s"stream=$streamed batch=$expect")
      // cross-definition pin: the face == a pure-Scala RRF (k=60) of
      // the two legs' OWN outputs (lexPanelTop / ivfPqProbeBatch)
      val qt = batchQ.select(col("query_id"), explode(array_distinct(
        graft.functions.TextFunctions.tokens(col("text")))).as("term"))
      val allTerms = qt.select("term").distinct()
        .as[String].collect().sorted.toSeq
      val lex = graft.ops.SimilarityQueries.lexPanelTop(
          spark.table(s"${lexTag}_lpost"), spark.table(s"${lexTag}_lstats"),
          qt, allTerms, 20, excludeSelf = false)
        .as[(Long, Long, Int)].collect()
        .map { case (qid, n, r) => (qid, n) -> r }.toMap
      val vec = VectorStream
        .ivfPqProbeBatch(spark, batchQ.select(
          col("query_id").as("vec_id"), col("v")), ivfTag, pqTag, k = 20)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect()
        .map { case (qid, n, r) => (qid, n) -> r }.toMap
      def r9(x: Double) = BigDecimal(x)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      val rrf = (lex.keySet ++ vec.keySet).toSeq.map { k =>
        val s = lex.get(k).map(r => r9(1.0 / (60 + r))).getOrElse(BigDecimal(0)) +
          vec.get(k).map(r => r9(1.0 / (60 + r))).getOrElse(BigDecimal(0))
        (k._1, k._2, s)
      }
      val expectFused = rrf.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex
          .take(5).map { case ((_, n, _), i) => (qid, i + 1, n) }
      }.sorted
      assert(streamed == expectFused,
        s"face=$streamed scalaRRF=$expectFused")
      // a query equal to a standing doc surfaces that doc in the fused
      // top-5 (both legs rank the twin high; excludeSelf=false)
      Seq(25L, 50L).foreach { qid =>
        assert(streamed.exists { case (q2, _, n) => q2 == qid && n == qid },
          s"stored twin of query $qid absent from fused top-5: $streamed")
      }
    } finally q.stop()
  }

  test("ivfDeleteBatch / pqDeleteBatch (r17, r16 missing #2): streamed " +
    "micro-batch deletes == one batch delete on the vec-grain stores " +
    "under any split; probes never emit deleted ids; replay is a no-op") {
    import spark.implicits._
    // twin corpora: the sf0.001 embeddings copied into two fresh dirs so
    // the deletes cannot touch the shared session artifacts other tests
    // read (tags derive from the dir)
    val src = java.nio.file.Paths.get(
      "/root/testdata/sf0.001/embeddings.parquet")
    val (dirS, dirB) = (Files.createTempDirectory("graft-vecdel-s"),
      Files.createTempDirectory("graft-vecdel-b"))
    for (d <- Seq(dirS, dirB))
      java.nio.file.Files.copy(src, d.resolve("embeddings.parquet"))
    val (ivfTagS, ivfTagB) = (graft.ops.IvfIndex.tag(dirS.toString, 16),
      graft.ops.IvfIndex.tag(dirB.toString, 16))
    val (pqTagS, pqTagB) = (graft.ops.PqStore.tag(dirS.toString),
      graft.ops.PqStore.tag(dirB.toString))
    graft.ops.IvfIndex.buildOrLoad(spark, dirS.toString, 16)
    graft.ops.IvfIndex.buildOrLoad(spark, dirB.toString, 16)
    graft.ops.PqStore.buildOrLoad(spark, dirS.toString)
    graft.ops.PqStore.buildOrLoad(spark, dirB.toString)
    val victims = Seq(10L, 25L, 40L)
    // reference: one batch delete; streamed: 1-id micro-batches (the
    // foreachBatch body — deletion is id-keyed and stateless, so the
    // face's semantics are exactly these calls)
    graft.ops.IvfIndex.delete(spark, victims.toDF("vec_id"), ivfTagB)
    graft.ops.PqStore.delete(spark, victims.toDF("vec_id"), pqTagB)
    for (id <- victims) {
      VectorStream.ivfDeleteBatch(spark, Seq(id).toDF("vec_id"), ivfTagS)
      VectorStream.pqDeleteBatch(spark, Seq(id).toDF("vec_id"), pqTagS)
    }
    def cells(t: String) = spark.table(s"${t}_ivfcells")
      .select("vec_id", "cell").as[(Long, Long)].collect().toSet
    def codes(t: String) = spark.table(s"${t}_pqcodes")
      .select("vec_id").as[Long].collect().toSet
    assert(cells(ivfTagS) == cells(ivfTagB))
    assert(codes(pqTagS) == codes(pqTagB))
    assert((codes(pqTagS) & victims.toSet).isEmpty)
    // serving receipt: a probe for a deleted vector's own embedding
    // cannot return the deleted id
    val probe = spark.read.parquet(s"$dirS/embeddings.parquet")
      .filter(col("vec_id") === 25L)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val got = VectorStream.annProbeBatch(spark, probe, ivfTagS)
      .select("neighbor_id").as[Long].collect().toSet
    assert((got & victims.toSet).isEmpty, s"deleted ids served: $got")
    // idempotent replay
    assert(VectorStream.ivfDeleteBatch(spark,
      Seq(25L).toDF("vec_id"), ivfTagS) == 0L)
    assert(VectorStream.pqDeleteBatch(spark,
      Seq(25L).toDF("vec_id"), pqTagS) == 0L)
    (graft.ops.IvfIndex.tables(ivfTagS) ++ graft.ops.IvfIndex.tables(ivfTagB) ++
      graft.ops.PqStore.tables(pqTagS) ++ graft.ops.PqStore.tables(pqTagB))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("streaming PQ encode against the stored codebook matches the " +
    "batch encoder and the stored codes for the same vectors") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val tag = graft.ops.PqStore.tag(dir)
    graft.ops.PqStore.buildOrLoad(spark, dir)
    val probes = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .filter(col("vec_id").isin(3L, 77L))
      .as[(Long, Seq[Double])].collect().toSeq
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int])]
    val input = MemoryStream[(Long, Seq[Double])]
    val q = input.toDF().toDF("vec_id", "v")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-pq").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = VectorStream.pqEncodeBatch(b.sparkSession, b, tag)
          .select("vec_id", "codes")
          .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
        sink.synchronized { sink ++= out }
        ()
      }
      .start()
    try {
      input.addData(probes: _*)
      q.processAllAvailable()
      val streamed = sink.synchronized(sink.toSeq).sortBy(_._1)
      assert(streamed.size == 2)
      // a corpus vector encoded at ingest time must reproduce its
      // STORED codes exactly (same codebook, same encoder definition)
      val stored = spark.table(s"${tag}_pqcodes")
        .filter(col("vec_id").isin(3L, 77L))
        .select("vec_id", "codes")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
        .toSeq.sortBy(_._1)
      assert(streamed == stored)
    } finally q.stop()
  }
}
