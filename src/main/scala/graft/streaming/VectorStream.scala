package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming face of the similarity-search suite: ingest-time ANN
  * probes of the STORED IVF index ([[graft.ops.IvfIndex]] — the same
  * bucketed artifact the batch queries score against).
  *
  * The probe ranking needs window functions, which append-mode
  * streaming disallows, so the probe runs from `foreachBatch` — full
  * batch semantics per micro-batch, the same sanctioned pattern as the
  * span-artifact maintenance sink. Per micro-batch: only the arriving
  * vectors are scored (centroids broadcast; the cell table streams in
  * place, scan-only), exactly the batch plan shape at batch size
  * |micro-batch|.
  */
object VectorStream {

  /** ANN top-k candidates for one micro-batch of vectors (vec_id, v)
    * against the stored index `tag` — the SAME probe definition as the
    * declared batch query ([[graft.ops.SimilarityQueries.ivfTopKFor]];
    * one definition, no drift). Returns (query_id, rank, neighbor_id,
    * cosine). Call inside `.writeStream.foreachBatch { (b, _) =>
    * sink(annProbeBatch(b.sparkSession, b, tag, nProbe)) }`.
    */
  def annProbeBatch(spark: SparkSession, batch: DataFrame, tag: String,
                    nProbe: Int = 4): DataFrame = {
    val cells = spark.table(s"${tag}_ivfcells")
    val cents = spark.table(s"${tag}_ivfcentroids")
    val q = batch
      .withColumn("qn",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"))
    // excludeSelf = false: a redelivered already-indexed vec_id must
    // surface its stored twin (the probe targets a STANDING index, not
    // a corpus self-join)
    graft.ops.SimilarityQueries.ivfTopKFor(q, cells, cents, nProbe,
        excludeSelf = false)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** IVFADC composed probe for one micro-batch of vectors (vec_id, v):
    * the ingest-time face of q_ann_ivfpq — probed cells
    * ([[graft.ops.SimilarityQueries.ivfPqCandidates]], the same probe +
    * candidate definition as the declared query) against the STORED
    * IvfIndex cell assignment gate which codes the STORED PqStore ADC
    * scan touches; only the probed fraction of the codes relation is
    * scored. Returns (query_id, rank, neighbor_id, adc_score) for the
    * top-k. `ivfTag`/`pqTag` name the stored artifacts (both must
    * exist — this is a probe, not a builder). Per micro-batch the
    * centroids and the per-query lookup tables broadcast; the cells
    * and codes tables stream in place, scan-only — exactly the batch
    * plan shape at batch size |micro-batch|.
    */
  def ivfPqProbeBatch(spark: SparkSession, batch: DataFrame,
                      ivfTag: String, pqTag: String, nProbe: Int = 4,
                      k: Int = 5): DataFrame = {
    val cents = spark.table(s"${ivfTag}_ivfcentroids")
    val member = spark.table(s"${ivfTag}_ivfcells")
      .select(col("vec_id"), col("cell"))
    val cb = spark.table(s"${pqTag}_pqcodebook")
    val codes = spark.table(s"${pqTag}_pqcodes")
    val q = batch
      .withColumn("qn",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("qn"))
    val cand = graft.ops.SimilarityQueries.ivfPqCandidates(
      q, cents, member, nProbe, excludeSelf = false)
    graft.ops.SimilarityQueries.pqAdcScoredFor(q, cand, cb, codes,
        excludeSelf = false)
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"),
        col("vec_id").as("neighbor_id"),
        round(col("score"), 6).as("adc_score"))
  }

  /** HYBRID retrieval for one micro-batch of QUERIES — the serving
    * face of `q_hybrid_fusion` (the fusion family's streaming column):
    * each arriving query carries BOTH forms a production RAG request
    * has — `text` (its lexical form) and `v` (its embedding) — and
    * retrieves the RRF-fused top-k from the two STANDING stores in one
    * call. Legs and fusion are the declared query's definitions
    * VERBATIM: [[graft.ops.SimilarityQueries.lexPanelTop]] (scorePanel
    * with both pushed caps) over the stored LexIndex `lexTag`,
    * [[graft.ops.SimilarityQueries.ivfPqCandidates]] +
    * `pqAdcScoredFor` over the stored `ivfTag`/`pqTag`, folded by
    * [[graft.ops.SimilarityQueries.rrfFuse]] — so serving-time fusion
    * cannot drift from the measured batch face. excludeSelf = false on
    * both legs (arriving queries are NOT corpus members; a query
    * textually/vectorially equal to a standing doc MUST surface that
    * doc — the redelivery convention of the other probe faces).
    * Stateless per query given the frozen stores, so stream union ==
    * batch EXACTLY over any micro-batch split (VectorStreamSpec).
    * Per micro-batch: the batch's term universe is collected once
    * (micro-batch- and vocabulary-bounded) and pushes into the
    * bucket-pruned posting scan; centroids/lookup tables broadcast;
    * postings, cells, and codes stream in place, scan-only. Returns
    * (query_id, rank, neighbor_id).
    */
  def hybridRetrieveBatch(spark: SparkSession, batch: DataFrame,
                          lexTag: String, ivfTag: String, pqTag: String,
                          nProbe: Int = 4, fuseN: Int = 20,
                          k: Int = 5): DataFrame = {
    val post = spark.table(s"${lexTag}_lpost")
    val stats = spark.table(s"${lexTag}_lstats")
    val qt = batch.select(col("query_id"), explode(array_distinct(
      graft.functions.TextFunctions.tokens(col("text")))).as("term"))
    val allTerms = qt.select("term").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val lexTop = graft.ops.SimilarityQueries.lexPanelTop(
      post, stats, qt, allTerms, fuseN, excludeSelf = false)
    val q = batch
      .withColumn("qn",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .select(col("query_id"), col("v").as("qv"), col("qn"))
    val cand = graft.ops.SimilarityQueries.ivfPqCandidates(
      q, spark.table(s"${ivfTag}_ivfcentroids"),
      spark.table(s"${ivfTag}_ivfcells").select(col("vec_id"), col("cell")),
      nProbe, excludeSelf = false)
    val vecTop = graft.ops.SimilarityQueries.pqAdcScoredFor(
        q, cand, spark.table(s"${pqTag}_pqcodebook"),
        spark.table(s"${pqTag}_pqcodes"), excludeSelf = false)
      .filter(col("rank") <= fuseN)
      .select(col("query_id"), col("vec_id"), col("rank"))
    graft.ops.SimilarityQueries.rrfFuse(lexTop, vecTop)
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** Ingest-time PQ encoding of one micro-batch of vectors (vec_id, v)
    * against the STORED codebook of the [[graft.ops.PqStore]] artifact
    * `tag` — the compression step an embedding pipeline applies as
    * vectors arrive, with the SAME encoder definition as the batch
    * build ([[graft.ops.SimilarityQueries.encodePq]]; no drift). The
    * caller's foreachBatch sink decides whether the rows feed
    * [[graft.ops.PqStore.append]] (artifact maintenance) or go to a
    * downstream store. Returns (vec_id, nrm, codes).
    */
  def pqEncodeBatch(spark: SparkSession, batch: DataFrame,
                    tag: String): DataFrame = {
    val n = batch
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .select(col("vec_id"), col("v"), col("nrm"))
    graft.ops.SimilarityQueries.encodePq(
      n, spark.table(s"${tag}_pqcodebook"))
  }

  /** Streaming takedown for the IVF index — the
    * CorpusStream.lexDeleteBatch pattern (r16 verdict missing #2) at
    * vec grain: a takedown-id stream applied per micro-batch via the
    * family's exact, idempotent delete verb; [[annProbeBatch]] can
    * never emit the deleted ids afterwards (centroid staleness shifts
    * which cells are PROBED, never which vectors exist — the batch
    * contract, healed by refreshCentroids). Returns cell rows removed.
    */
  def ivfDeleteBatch(spark: SparkSession, ids: DataFrame,
                     tag: String): Long = {
    val n = graft.ops.IvfIndex.delete(spark, ids.select("vec_id"), tag)
    graft.ops.IvfIndex.tables(tag)
      .filter(spark.catalog.tableExists)
      .foreach(spark.catalog.refreshTable)
    n
  }

  /** Streaming takedown for the PQ store — same pattern; code rows are
    * per-vector facts, so post-delete reads equal a rebuild over the
    * survivors under the frozen codebook. Returns code rows removed.
    */
  def pqDeleteBatch(spark: SparkSession, ids: DataFrame,
                    tag: String): Long = {
    val n = graft.ops.PqStore.delete(spark, ids.select("vec_id"), tag)
    graft.ops.PqStore.tables(tag)
      .filter(spark.catalog.tableExists)
      .foreach(spark.catalog.refreshTable)
    n
  }
}
