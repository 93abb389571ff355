package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stored MinHash dedup index — the materialized artifact the
  * incremental-ingest path (SURVEY.md §2 H3++) and the streaming
  * near-dup probe ([[graft.streaming.CorpusStream.nearDupCandidates]])
  * read, instead of re-deriving the standing corpus's bands per run.
  *
  * Two bucketed tables per corpus snapshot:
  *
  *   - `<tag>_shingles` (doc_id, sh)            bucketed by doc_id
  *   - `<tag>_bands`    (doc_id, band, bh, bsz) bucketed by (band, bh)
  *
  * `bsz` — the (band, bh) bucket's population — is PRECOMPUTED at build
  * time, so the hot-bucket cap is a pushed parquet predicate on the
  * stored column; the previous shape recomputed it as a window
  * `count(*) over (partition by band, bh)` over the WHOLE index on every
  * incremental run — a full index shuffle that contradicted the
  * operator's own "only the arriving batch shuffles" claim.
  *
  * Bucketing on the probe key means a probe equi-join on (band, bh)
  * satisfies the join's required distribution straight off the scan:
  * the index side is scan-only (no Exchange above it — asserted by
  * DedupOpsSpec's plan-shape test), and only the arriving batch is
  * shuffled (or broadcast, when the batch is small enough). The shingle
  * store is bucketed on doc_id for the same reason: the Jaccard-verify
  * join on match_id reads it without an index-side shuffle.
  *
  * At 100 TB this is a daily-maintained table pair (append new docs'
  * bands, periodically recompact / refresh bsz); here the build runs
  * once per (session, corpus snapshot) keyed by catalog presence —
  * `tableExists` — so repeated queries in one session reuse the files
  * on disk and a fresh session rebuilds from current inputs (no
  * staleness window).
  */
object BandIndex {

  /** Buckets for both tables. Sized for local[32] test scale; at 100 TB
    * pick buckets so one bucket's bands fit an executor's shuffle
    * partition budget (thousands).
    */
  private val NumBuckets = 8

  /** A catalog-safe table-name prefix for a corpus snapshot: sf dir +
    * role, lowercased, non-alphanumerics folded to `_`.
    */
  def tag(dir: String, role: String): String =
    ("graft_" + dir + "_" + role).toLowerCase
      .replaceAll("[^a-z0-9]+", "_").replaceAll("^_+", "")

  /** The default (in-memory) catalog forgets tables across JVMs while
    * their files persist in the warehouse dir; CTAS then refuses the
    * occupied location. Drop stale locations so every fresh session
    * rebuilds from current inputs. Shared by every stored-artifact
    * builder (band index, span set).
    */
  private[ops] def dropStaleLocations(spark: SparkSession,
                                      tables: Seq[String]): Unit =
    for (t <- tables) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(t)))
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
    }

  /** Materialize (or reuse, if already cataloged this session) the band
    * index for `standingDocs` (must carry doc_id + text). Returns
    * (shingleStore, bandIndex) as reads of the stored bucketed tables.
    */
  def buildOrLoad(spark: SparkSession, standingDocs: DataFrame,
                  tag: String,
                  log: graft.etl.MigrationLog = graft.etl.MigrationLog.silent
                 ): (DataFrame, DataFrame) = {
    val shT = s"${tag}_shingles"
    val bdT = s"${tag}_bands"
    if (!spark.catalog.tableExists(bdT)) {
      dropStaleLocations(spark, Seq(shT, bdT))
      DedupQueries.shingleRows(standingDocs)
        .write.mode(SaveMode.Overwrite)
        .bucketBy(NumBuckets, "doc_id").sortBy("doc_id")
        .saveAsTable(shT)
      // Bands derive from the stored shingles (one shingling pass total);
      // the bucket-size window runs ONCE here, at build time — never
      // again on the read path.
      val wb = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
      DedupQueries.bandsFromShingles(spark.table(shT))
        .withColumn("bsz", count(lit(1)).over(wb))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(NumBuckets, "band", "bh").sortBy("band", "bh")
        .saveAsTable(bdT)
      // Readers cap hot buckets with `bsz <= HotBucketCap`; surface what
      // that cap will silently skip, once, at build time (the stored bsz
      // makes this a cheap scan-side aggregate).
      val (nBuckets, nRows) = hotBucketAudit(spark, tag)
      val msg = s"hot_bucket_cap=${DedupQueries.HotBucketCap} " +
        s"skipped_buckets=$nBuckets skipped_rows=$nRows"
      if (nBuckets > 0) log.warn(bdT, "band_index_build", msg)
      else log.info(bdT, "band_index_build", msg)
    }
    (spark.table(shT), spark.table(bdT))
  }

  /** What the hot-bucket cap will silently skip on the stored index:
    * (over-cap buckets, rows inside them). Scan-only — `bsz` is a
    * stored column — so the pipeline can surface every silent cap as a
    * report line without a window over the index.
    */
  def hotBucketAudit(spark: SparkSession, tag: String,
                     cap: Int = DedupQueries.HotBucketCap): (Long, Long) = {
    val r = spark.table(s"${tag}_bands")
      .filter(col("bsz") > cap)
      .agg(count_distinct(struct(col("band"), col("bh"))).as("n_buckets"),
        count(lit(1)).as("n_rows"))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Daily-ingest maintenance: append `newDocs`' shingles and bands to
    * the stored tables (insertInto preserves the bucket spec, so reads
    * stay exchange-free). Appended band rows carry bsz counted WITHIN
    * the batch — a lower bound on the true bucket size, so the
    * hot-bucket cap errs toward keeping buckets until the next
    * [[refreshBucketSizes]]; already-capped buckets stay capped (their
    * standing rows keep the over-cap bsz). Staleness is bounded by the
    * refresh cadence.
    */
  def append(spark: SparkSession, newDocs: DataFrame, tag: String): Unit = {
    val shT = s"${tag}_shingles"
    val bdT = s"${tag}_bands"
    require(spark.catalog.tableExists(shT) && spark.catalog.tableExists(bdT),
      s"append target $tag does not exist — buildOrLoad first")
    val sh = DedupQueries.shingleRows(newDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sh.write.insertInto(shT)
      val wb = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
      DedupQueries.bandsFromShingles(sh)
        .withColumn("bsz", count(lit(1)).over(wb))
        .select("doc_id", "band", "bh", "bsz")
        .write.insertInto(bdT)
    } finally sh.unpersist()
  }

  /** Periodic compaction: rebuild the band table from the shingle store
    * with exact bucket sizes (appends leave bsz a per-batch lower
    * bound). Recomputing from shingles avoids reading the table being
    * overwritten; at 100 TB this is the index's scheduled compaction
    * job — a snapshot-and-swap in a real table format, a bucketed
    * overwrite here.
    */
  def refreshBucketSizes(spark: SparkSession, tag: String): Unit = {
    val shT = s"${tag}_shingles"
    val bdT = s"${tag}_bands"
    val wb = org.apache.spark.sql.expressions.Window.partitionBy("band", "bh")
    DedupQueries.bandsFromShingles(spark.table(shT))
      .withColumn("bsz", count(lit(1)).over(wb))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(NumBuckets, "band", "bh").sortBy("band", "bh")
      .saveAsTable(bdT)
  }
}
