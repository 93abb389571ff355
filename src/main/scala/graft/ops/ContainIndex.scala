package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stored containment index — the SIXTH stored artifact family (after
  * band index, span set, IVF cells, chunk store, PQ store): the
  * inverted word-3-gram index + per-doc n-gram arrays the incremental
  * containment path (`q_containment_incremental`) and the streaming
  * ingest probe ([[graft.streaming.CorpusStream.containmentProbe]])
  * read, instead of re-deriving the standing corpus's n-grams per run.
  *
  * Two bucketed tables per corpus snapshot:
  *
  *   - `<tag>_cngrams` (g1, doc_id, na, df)   bucketed by g1
  *   - `<tag>_cdocs`   (doc_id, ng, na, oc)   bucketed by doc_id
  *
  * `df` — each n-gram's standing document frequency — and `oc` — each
  * doc's count of OVER-CAP n-grams — are PRECOMPUTED at build time, so
  * the df-cap candidate restriction (`df <= cap`) is a pushed parquet
  * predicate on the posting scan and the support prefilter's
  * min(oc_a, oc_b) bound reads a stored column; recomputing either on
  * the read path would shuffle the whole index per probe (the
  * BandIndex `bsz` argument verbatim). Bucketing on the probe keys
  * (g1 for the posting join, doc_id for the verify join) keeps the
  * index sides scan-only — only the arriving batch shuffles.
  *
  * At 100 TB this is a daily-maintained table pair (append new docs'
  * postings with batch-local df lower bounds, periodically
  * [[refreshCounts]] to exact df/oc); here the build runs once per
  * (session, corpus snapshot) keyed by catalog presence, like every
  * other family.
  */
object ContainIndex {

  /** Catalog tag for a corpus dir + role (delegates to the shared
    * convention).
    */
  def tag(dir: String, role: String): String = BandIndex.tag(dir, role)

  /** Materialize (or reuse, if already cataloged this session) the
    * containment index for `standingDocs` (must carry doc_id + text).
    * Returns (postings, docArrays) as reads of the stored tables.
    */
  def buildOrLoad(spark: SparkSession, standingDocs: DataFrame,
                  tag: String,
                  targetRowsPerBucket: Long = BandIndex.TargetRowsPerBucket
                 ): (DataFrame, DataFrame) = {
    val ngT = s"${tag}_cngrams"
    val dcT = s"${tag}_cdocs"
    // Gate on BOTH tables (r10 ADVICE #3): a crash between the two
    // saveAsTable calls would otherwise leave ngT cataloged with dcT
    // missing, and every later call would short-circuit into a
    // missing-table error until manual repair. Requiring both means a
    // partial build self-heals by rebuilding.
    if (!(spark.catalog.tableExists(ngT) && spark.catalog.tableExists(dcT))) {
      BandIndex.dropStaleLocations(spark, Seq(ngT, dcT))
      val g = DedupQueries.ngramDocs(standingDocs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val inv = g.select(col("doc_id"), size(col("ng")).as("na"),
          explode(col("ng")).as("g1"))
        // df via ONE build-time window over the posting key — never
        // again on the read path (the bsz convention)
        val wg = org.apache.spark.sql.expressions.Window.partitionBy("g1")
        val post = inv.withColumn("df", count(lit(1)).over(wg))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val buckets =
            BandIndex.derivedBuckets(post.count(), targetRowsPerBucket)
          post.select("g1", "doc_id", "na", "df")
            .write.mode(SaveMode.Overwrite)
            .bucketBy(buckets, "g1").sortBy("g1")
            .saveAsTable(ngT)
          // per-doc over-cap count from the SAME df relation, joined
          // back to the arrays; docs whose n-grams are all rare get 0
          val oc = post.filter(col("df") > DedupQueries.ContainDfCap)
            .groupBy("doc_id").agg(count(lit(1)).as("oc"))
          g.join(oc, Seq("doc_id"), "left")
            .select(col("doc_id"), col("ng"), size(col("ng")).as("na"),
              coalesce(col("oc"), lit(0L)).as("oc"))
            .write.mode(SaveMode.Overwrite)
            .bucketBy(buckets, "doc_id").sortBy("doc_id")
            .saveAsTable(dcT)
        } finally post.unpersist()
      } finally g.unpersist()
    }
    (spark.table(ngT), spark.table(dcT))
  }

  /** Daily-ingest maintenance: append `newDocs`' postings and arrays.
    * Appended rows carry df counted WITHIN the batch — a lower bound on
    * the true frequency, which errs toward treating n-grams as rare:
    * recall-safe (extra candidates), cost-unsafe until the next
    * [[refreshCounts]] — the BandIndex `bsz` staleness contract with
    * the inequality pointing the same (safe) way.
    */
  def append(spark: SparkSession, newDocs: DataFrame, tag: String): Unit = {
    val ngT = s"${tag}_cngrams"
    val dcT = s"${tag}_cdocs"
    require(spark.catalog.tableExists(ngT) && spark.catalog.tableExists(dcT),
      s"append target $tag does not exist — buildOrLoad first")
    val g = DedupQueries.ngramDocs(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val inv = g.select(col("doc_id"), size(col("ng")).as("na"),
        explode(col("ng")).as("g1"))
      val wg = org.apache.spark.sql.expressions.Window.partitionBy("g1")
      val post = inv.withColumn("df", count(lit(1)).over(wg))
      post.select("g1", "doc_id", "na", "df").write.insertInto(ngT)
      val oc = post.filter(col("df") > DedupQueries.ContainDfCap)
        .groupBy("doc_id").agg(count(lit(1)).as("oc"))
      g.join(oc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("ng"), size(col("ng")).as("na"),
          coalesce(col("oc"), lit(0L)).as("oc"))
        .write.insertInto(dcT)
    } finally g.unpersist()
  }

  /** Periodic compaction: recompute exact df over the full stored
    * posting relation and exact oc per doc, rewriting both tables with
    * their bucket specs preserved (appends leave df/oc per-batch lower
    * bounds).
    */
  def refreshCounts(spark: SparkSession, tag: String): Unit = {
    val ngT = s"${tag}_cngrams"
    val dcT = s"${tag}_cdocs"
    val buckets = BandIndex.bucketsOf(spark, ngT)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("g1")
    val post = spark.table(ngT)
      .select(col("g1"), col("doc_id"), col("na"))
      .withColumn("df", count(lit(1)).over(wg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stagedNg = post.select("g1", "doc_id", "na", "df")
        .localCheckpoint() // sever from the table being overwritten
      val oc = post.filter(col("df") > DedupQueries.ContainDfCap)
        .groupBy("doc_id").agg(count(lit(1)).as("oc"))
      val stagedDc = spark.table(dcT).select("doc_id", "ng", "na")
        .join(oc, Seq("doc_id"), "left")
        .select(col("doc_id"), col("ng"), col("na"),
          coalesce(col("oc"), lit(0L)).as("oc"))
        .localCheckpoint()
      stagedNg.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "g1").sortBy("g1").saveAsTable(ngT)
      stagedDc.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "doc_id").sortBy("doc_id").saveAsTable(dcT)
    } finally post.unpersist()
  }

  /** Takedown maintenance (r15 verdict #1, dual of [[append]]): remove
    * every posting and doc-array row of `docIds`. A deleted doc can
    * never be emitted as a candidate or verified as a match again —
    * its postings AND its n-gram array are gone. Surviving counts go
    * stale in the DUAL direction of append's batch-local lower bounds:
    *   - posting `df` becomes a stale UPPER bound (it counted deleted
    *     docs), so the `df <= cap` candidate restriction may SKIP an
    *     n-gram deletion brought back under the cap — cost-safe but
    *     recall-lossy at the cap margin (append's lower bound erred the
    *     recall-safe way; the two verbs bracket the truth);
    *   - doc-array `oc` becomes a stale UPPER bound, so the support
    *     prefilter's `bound − min(oca, ocb)` threshold drops — MORE
    *     candidates pass, recall-safe and cost-unsafe (same direction
    *     as append here: oc only ever over-subtracts).
    * [[refreshCounts]] re-levels both, after which [[probe]] ==
    * rebuild-over-survivors exactly (ContainIndexSpec differential on
    * the serving face). Survivors staged (localCheckpoint); the
    * doc-array table — written second at build — drops FIRST so a
    * crash between the writes breaks the both-tables gate into a
    * rebuild (the IvfIndex split/merge write order). Returns
    * (posting rows removed, doc-array rows removed).
    */
  def delete(spark: SparkSession, docIds: DataFrame,
             tag: String): (Long, Long) = {
    val ngT = s"${tag}_cngrams"
    val dcT = s"${tag}_cdocs"
    require(spark.catalog.tableExists(ngT) && spark.catalog.tableExists(dcT),
      s"delete target $tag does not exist — buildOrLoad first")
    val ids = broadcast(docIds.select(col("doc_id")).distinct())
    val ng = spark.table(ngT)
    val dc = spark.table(dcT)
    val ngRemoved = ng.join(ids, Seq("doc_id"), "left_semi").count()
    val dcRemoved = dc.join(ids, Seq("doc_id"), "left_semi").count()
    if (ngRemoved == 0L && dcRemoved == 0L) return (0L, 0L)
    val buckets = BandIndex.bucketsOf(spark, ngT)
    val stagedNg = ng.join(ids, Seq("doc_id"), "left_anti")
      .select("g1", "doc_id", "na", "df")
      .localCheckpoint()
    val stagedDc = dc.join(ids, Seq("doc_id"), "left_anti")
      .select("doc_id", "ng", "na", "oc")
      .localCheckpoint()
    spark.sql(s"DROP TABLE IF EXISTS $dcT")
    stagedNg.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "g1").sortBy("g1")
      .saveAsTable(ngT)
    stagedDc.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .saveAsTable(dcT)
    spark.catalog.refreshTable(ngT)
    spark.catalog.refreshTable(dcT)
    (ngRemoved, dcRemoved)
  }

  /** What the df cap silently excludes from candidate generation on
    * the stored index: (over-cap distinct n-grams, posting rows inside
    * them). Scan-only — `df` is a stored column — so the pipeline can
    * surface every silent cap as a report line (the hot-bucket-audit
    * convention).
    */
  def capAudit(spark: SparkSession, tag: String,
               cap: Int = DedupQueries.ContainDfCap): (Long, Long) = {
    val r = spark.table(s"${tag}_cngrams")
      .filter(col("df") > cap)
      .agg(count_distinct(col("g1")).as("n_grams"),
        count(lit(1)).as("n_rows"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Derived bucket count this tag was built with — a report-row
    * metric (the sizing choice must be visible).
    */
  def buckets(spark: SparkSession, tag: String): Int =
    BandIndex.bucketsOf(spark, s"${tag}_cngrams")

  /** Whether the stored index for `tag` is fully cataloged (the
    * IvfIndex convention).
    */
  def exists(spark: SparkSession, tag: String): Boolean =
    spark.catalog.tableExists(s"${tag}_cngrams") &&
      spark.catalog.tableExists(s"${tag}_cdocs")

  /** The probe — ONE definition shared by the declared incremental
    * query and the streaming ingest face, so batch and stream cannot
    * drift. `newG` carries the arriving docs' (doc_id, ng); `postings`
    * / `docArrays` are the stored tables. Returns each arriving doc's
    * best standing match at containment >= tau: (doc_id, match_id,
    * containment, jaccard).
    *
    * Shape: candidates from the df-capped posting join (pushed `df <=
    * cap` predicate, index scan-only), support-prefiltered with the
    * SOUND integer bound (see q_dedup_containment — the emitted set is
    * unchanged by it), exact set-intersection verify against the
    * stored arrays (doc_id-bucketed — scan-only on the verify key),
    * best match by (containment desc, match_id asc). Only the arriving
    * batch shuffles.
    */
  def probe(newG: DataFrame, postings: DataFrame,
            docArrays: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cap = DedupQueries.ContainDfCap
    val ninv = newG.select(col("doc_id"), size(col("ng")).as("naa"),
      explode(col("ng")).as("g1"))
    // arriving docs' over-cap counts, judged on STANDING df (an n-gram
    // absent from the index has no standing df — it is neither rare
    // nor shared, so it contributes to neither side of the bound)
    val overG = postings.filter(col("df") > cap).select("g1").distinct()
    val nocs = ninv.join(overG, "g1")
      .groupBy("doc_id").agg(count(lit(1)).as("oca"))
    val post = postings.filter(col("df") <= cap)
      .select(col("g1"), col("doc_id").as("match_id"), col("na").as("nab"))
    val pairs = ninv.join(post, "g1")
      .groupBy(col("doc_id"), col("match_id"), col("naa"), col("nab"))
      .agg(count(lit(1)).as("support"))
    val socs = docArrays.select(col("doc_id").as("match_id"),
      col("oc").as("ocb"))
    val cand = pairs
      .join(broadcast(nocs.select(col("doc_id"), col("oca"))), Seq("doc_id"),
        "left")
      .join(socs, "match_id")
      .filter(col("support") >= greatest(lit(1),
        expr(DedupQueries.containSupportBound("least(naa, nab)")) -
          least(coalesce(col("oca"), lit(0L)), col("ocb"))))
      .select("doc_id", "match_id")
    val a = newG.select(col("doc_id"), col("ng").as("nga"))
    val b = docArrays.select(col("doc_id").as("match_id"),
      col("ng").as("ngb"))
    val wBest = Window.partitionBy("doc_id")
      .orderBy(col("cont").desc, col("match_id").asc)
    cand.join(a, "doc_id").join(b, "match_id")
      .withColumn("inter", size(array_intersect(col("nga"), col("ngb"))))
      .withColumn("cont", col("inter").cast("double") /
        least(size(col("nga")), size(col("ngb"))))
      .filter(col("cont") >= DedupQueries.ContainTau)
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("match_id"),
        round(col("cont"), 6).as("containment"),
        round(col("inter").cast("double") /
          (size(col("nga")) + size(col("ngb")) - col("inter")), 6)
          .as("jaccard"))
      .orderBy("doc_id")
  }
}
