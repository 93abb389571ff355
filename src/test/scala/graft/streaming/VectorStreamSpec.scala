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
