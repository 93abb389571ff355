package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Semantics of the chunking operator on engineered doc lengths: the
  * contract is FULL TAIL COVERAGE — every token of every doc falls in
  * at least one chunk — with starts on the stride grid and the overlap
  * rule deciding the final chunk. (q_seq_packing itself is covered by
  * the oracle gate; chunking's edge cases deserve explicit pins.)
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("sourcePrefixSum (two-level distributed prefix sum) == the " +
    "single per-source window cumsum on a planted mega-source, " +
    "multi-bucket W (r17 verdict #2)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // one mega-source holding most docs (the 100 TB hazard: a handful
    // of sources, one dominating) + a small one; sparse NON-CONTIGUOUS
    // doc_ids so bucket boundaries don't align with row counts
    val rows = (1 to 400).map(i =>
      ("mega", i.toLong * 7, (i % 13 + 1).toLong)) ++
      (1 to 30).map(i => ("tail", i.toLong * 11, (i % 5 + 1).toLong))
    val base = rows.toDF("source", "doc_id", "n_tokens")
    // W=64 over doc_ids up to 2800 → ~44 buckets on the mega source
    val viaTwoLevel = PackingQueries.sourcePrefixSum(base, bucketW = 64L)
      .select("source", "doc_id", "n_tokens", "cum")
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = base.withColumn("cum", sum("n_tokens").over(w))
      .select("source", "doc_id", "n_tokens", "cum")
    assert(viaTwoLevel.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaTwoLevel).isEmpty)
    // single-bucket degenerate case (the default W at test scale)
    val viaDefault = PackingQueries.sourcePrefixSum(base)
      .select("source", "doc_id", "n_tokens", "cum")
    assert(viaDefault.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaDefault).isEmpty)
    // no corpus-grain window partitioned by source alone: every Window
    // operator in the plan either includes the bucket key or runs on
    // the bucket-GRAIN relation (whose row count is N/W, not N)
    val plan = viaTwoLevel.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "expected the two window levels")
  }

  test("q_doc_chunk covers every token exactly per the stride/overlap contract") {
    val d = Files.createTempDirectory("chunkspec").toString
    def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")
    // engineered lengths around the W=32 / stride=24 boundaries:
    // 1 (single short chunk), 32 (exactly one), 33 (tail chunk of 9),
    // 50 (two chunks), 80 (three chunks)
    Seq((1L, doc(1)), (32L, doc(32)), (33L, doc(33)), (50L, doc(50)),
      (80L, doc(80)))
      .toDF("doc_id", "text")
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_doc_chunk")(spark, d)
      .select("doc_id", "chunk_idx", "start_tok", "n_chunk_tok")
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    def spans(id: Long): Seq[(Long, Long)] =
      rows(id).map(r => (r._3, r._3 + r._4 - 1))
    assert(spans(1L) == Seq((1L, 1L)))
    assert(spans(32L) == Seq((1L, 32L)))
    // 33 tokens: [1..32] then the tail chunk [25..33] (9 tokens)
    assert(spans(33L) == Seq((1L, 32L), (25L, 33L)))
    assert(spans(50L) == Seq((1L, 32L), (25L, 50L)))
    assert(spans(80L) == Seq((1L, 32L), (25L, 56L), (49L, 80L)))
    // the coverage contract, stated once for all docs: union of spans
    // is exactly [1..n] with no gap
    for ((id, n) <- Seq(1L -> 1, 32L -> 32, 33L -> 33, 50L -> 50, 80L -> 80)) {
      val covered = spans(id).flatMap { case (a, b) => a to b }.toSet
      assert(covered == (1L to n.toLong).toSet, s"doc $id coverage hole")
    }
  }
}
