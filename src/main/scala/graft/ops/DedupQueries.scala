package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication suite over `documents` / `embeddings` (SURVEY.md §2 H1/H3
  * and the training-data-pipeline mandate): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): exact dedup is a hash shuffle on the key; MinHash
  * LSH turns all-pairs similarity into an equi-join on (band, band_hash)
  * buckets — the only all-pairs work left is within buckets; SimHash is a
  * pure per-row map + groupBy fingerprint; the n-gram variant blocks on the
  * min-gram (1-hash LSH) before computing exact Jaccard; the cosine variant
  * buckets both sides with banded hyperplane LSH (OR-amplified) and
  * verifies exact cosine within buckets — no cartesian anywhere.
  */
object DedupQueries {

  // MinHash parameters: char-5-gram shingles, 12 hashes in 3 bands x 4 rows
  // -> LSH threshold ~(1/3)^(1/4) ~= 0.76; candidates verified at j >= 0.6
  // (the corpus separates cleanly: background ~0.3, true near-dups >= 0.9).
  private val ShingleK = 5
  private val NumHashes = 12
  private[graft] val Bands = 3
  private val RowsPerBand = 4
  private val MinhashVerifyJ = 0.6
  private val NgramJ = 0.5
  private val CosineTau = 0.4

  /** q_dedup_tau_sweep thresholds — brackets [[MinhashVerifyJ]] so the
    * sweep shows what moving the committed verify threshold would do
    * in both directions. ONE Seq feeds the Spark aggs AND the
    * generated oracle arms (the Bm25Terms no-drift convention).
    */
  private val TauSweep = Seq(0.4, 0.5, 0.6, 0.7, 0.8)

  /** q_dedup_containment: report threshold on |A∩B|/min(|A|,|B|), and
    * the document-frequency cap above which an n-gram is too common to
    * generate candidate pairs (bounds every posting list — the
    * candidate join's per-key fan-out is <= cap² at any corpus size).
    */
  // The containment threshold is stored as a RATIONAL and every
  // consumer derives from it (r10 ADVICE #1): the double threshold the
  // verify stage and the oracles compare against, AND the integer
  // support-prefilter bound — so changing the threshold can never
  // silently desynchronize the prefilter from the verify and unsoundly
  // drop true pairs.
  private[graft] val ContainTauNum = 4
  private[graft] val ContainTauDen = 5
  private[graft] val ContainTau: Double =
    ContainTauNum.toDouble / ContainTauDen
  /** Integer-exact ceil(tau * m) for the sound support prefilter:
    * support >= ceil(tau*min(na,nb)) - overcap is implied by
    * containment >= tau (see the soundness note at the candidate
    * stage). One definition for the batch query and the stored-index
    * probe.
    */
  private[graft] def containSupportBound(m: String): String =
    s"($ContainTauNum * ($m) + ${ContainTauDen - 1}) div $ContainTauDen"
  private[graft] val ContainDfCap = 16

  /** (doc_id, ng) word-3-gram sets for any relation carrying doc_id +
    * text — the containment family's shared projection (same staged
    * discipline as q_dedup_ngram: the emptiness guard runs on the
    * cheap token stage; see there). Stateless per row — usable on a
    * STREAMING input ([[graft.streaming.CorpusStream]] probes the
    * stored [[ContainIndex]] with this).
    */
  private[graft] def ngramDocs(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ng"))

  /** [[ngramDocs]] over the full corpus, persisted (r18, §3.3/§5):
    * q_dedup_containment references it 4x (the inverted index feeding
    * rare + the support counts, and both exact-verify legs) and
    * q_containment_recall 3x more — each reference previously re-ran
    * the tokenize + wordNgrams corpus pass. Same cache-vs-recompute
    * knob as the minhash shingle relation (n-gram sets ~ corpus-sized;
    * MEMORY_AND_DISK spills, release after the family's last
    * consumer). */
  private def containGramsPersisted(s: org.apache.spark.sql.SparkSession,
                                    dir: String): DataFrame =
    SharedCaches.track(SharedCaches.ContainGrams,
      ngramDocs(Tables.par(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Published-SemDeDup operating point (Abbas et al. use τ near 0.99 on
    * near-identical pairs). The shipped corpora have NO natural pairs
    * above cosine ~0.51 (measured: max panel cosine 0.470/0.513 at
    * sf0.001/0.01), so the high-τ regime is measured on PLANTED
    * near-identical twins: each panel vector blended with its circular
    * shift at α=0.2, which guarantees pair cosine ≥ ~0.97 for any
    * vector (the blend of two unit vectors at angle θ has cosine
    * ((1-α)+αcosθ)/‖(1-α)v̂+αŵ‖ ≥ 0.970 over all θ). The measurement is
    * then exactly the published question: does cell blocking co-locate a
    * near-identical pair?
    */
  private val HighTau = 0.95

  /** q_dedup_recall measurement panel: every doc with id ≡ 0 (mod Mod)
    * plus the id < Prefix slice — a fixed, scale-independent sample the
    * exact all-pairs ground truth is computed on (the union keeps the
    * panel non-degenerate at every shipped scale factor: the prefix
    * slice carries the sf0.01 near-dups, the modular slice the sf0.1
    * ones). Ground-truth cost is |panel|², bounded by design — the same
    * exact-baseline-on-a-capped-panel pattern as q_ann_recall.
    */
  private val RecallMod = 10
  private val RecallPrefix = 200

  /** q_dedup_semantic_recall panel (same bounded-exact-truth pattern,
    * over the embedding corpus): id ≡ 0 (mod 2) plus id < 200 — denser
    * than the text panel because the embedding corpus is ~4x smaller
    * than the document corpus at every shipped scale factor, and the
    * cross-cell miss count needs enough true pairs to have teeth.
    */
  private val EmbPanelMod = 2
  private val EmbPanelPrefix = 200

  /** Target mean cluster size for the SemDeDup target-cluster cell
    * derivation ([[SimilarityQueries.derivedCellsForTarget]]): small
    * against the test corpora so the two derivations measurably
    * diverge (500 vecs → 63 cells vs √n's 22). At 100 TB the knob is
    * set in the thousands — see derivedCellsForTarget's Scaladoc for
    * the cost argument.
    */
  private val SemTargetCluster = 8

  /** LSH bucket-size cap (SURVEY §2 H3 "cap boilerplate buckets"): buckets
    * larger than this are boilerplate (headers, licenses, near-empty docs)
    * and are skipped rather than expanded into O(bucket²) pairs. Testdata
    * max bucket is 66 at sf0.1, so the cap is inert for correctness here;
    * at 100 TB it is the difference between a bounded self-join and one
    * hot bucket generating 10^12 candidate pairs.
    */
  private[graft] val HotBucketCap = 256

  /** Hyperplane-LSH banding for embedding near-dup: 4 bands x 4 planes.
    * OR-amplified collision probability for a pair at angle θ is
    * 1-(1-(1-θ/π)^4)^4 ≈ 0.95 at cosine 0.9 — high recall for true
    * near-dups, while the bucket equi-join keeps work linear in bucket
    * sizes instead of the corpus-squared cross join.
    */
  private val EmbBands = 4
  private val EmbPlanesPerBand = 4
  private val EmbDim = 64
  private val embBandPlanes: Seq[Seq[Seq[Double]]] =
    makePlanes(EmbBands * EmbPlanesPerBand, EmbDim).grouped(EmbPlanesPerBand).toSeq


  /** doc_id + distinct char-k shingle set of normalized text (native
    * one-pass [[graft.functions.CharShingles]]). Staged as two projections
    * so downstream filters can never inline the shingle tree below the
    * normText projection.
    */
  private def shingleDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), normText(col("text")).as("nt"))
      .select(col("doc_id"), charShingles(col("nt"), ShingleK).as("sh"))

  /** (doc_id, sh) for any relation carrying doc_id + text — the builder
    * [[BandIndex]] persists as the stored shingle table.
    */
  private[graft] def shingleRows(docs: DataFrame): DataFrame = shingleDf(docs)

  /** (doc_id, band, bh) from a shingle relation — same Bands/RowsPerBand
    * expressions as the batch pipeline, so a stored index built from
    * this cannot drift from the ad-hoc path.
    */
  private[graft] def bandsFromShingles(sh: DataFrame): DataFrame =
    sh.select(col("doc_id"),
      posexplode(graft.functions.MinHashBands(col("sh"), Bands, RowsPerBand))
        .as(Seq("band", "bh")))

  private val shingleSqlCte =
    s"""t AS (SELECT doc_id, $normSql AS nt FROM documents),
       |d AS (SELECT doc_id, list_distinct(list_transform(
       |  range(1, length(nt)-${ShingleK - 2}), i -> substr(nt,i,$ShingleK))) AS sh FROM t)""".stripMargin

  // Hash material: 3 seeded md5s per shingle -> 12 independent 32-bit
  // slices (4 per md5); sig_i = min over slice i.
  private val materialSql =
    "list_transform(sh, x -> md5('0:'||x)||md5('1:'||x)||md5('2:'||x))"
  private val sigSql = (0 until NumHashes).map(i =>
    s"list_aggregate(list_transform(hs, h -> substr(h,${1 + 8 * i},8)),'min')")
    .mkString("[", ", ", "]")

  /** The shingle relation, persisted: consumed by the band pipeline and
    * both Jaccard-verify legs, and by ALL of q_doc_dedup /
    * q_dedup_clusters / q_dedup_incremental (CacheManager matches the
    * canonicalized plan, so one materialization serves every consumer in
    * the session). At 100 TB this is the classic cache-vs-recompute knob:
    * the relation is ~shingle-count x k bytes, so MEMORY_AND_DISK makes
    * it a disk-backed spill; dropping the persist trades extra scans for
    * zero cache footprint — both plans are correct.
    */
  private def shinglesPersisted(s: org.apache.spark.sql.SparkSession,
                                dir: String): DataFrame =
    SharedCaches.track(SharedCaches.Minhash,
      shingleDf(Tables.par(s, dir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** The (doc_id, band, band_hash) LSH band index, persisted: it is the
    * dedup family's stored artifact — the relation an incremental ingest
    * joins against — and the seeded-md5 MinHash pass that builds it
    * dominates pipeline cost, so the self-join legs, the cluster query,
    * and both sides of the incremental query read one materialization.
    */
  private def bandsPersisted(sh: DataFrame): DataFrame =
    SharedCaches.track(SharedCaches.Minhash,
      bandsFromShingles(sh)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** MinHash+LSH verified near-dup pairs (the q_doc_dedup pipeline),
    * shared with the cluster-consolidation query so both stay one code
    * path. Returns (doc_a, doc_b, j) with doc_a < doc_b, j >= threshold,
    * persisted (edges ≪ corpus; the shared output of q_doc_dedup and
    * q_dedup_clusters).
    */
  /** (doc_id [, passthrough...], band, band_hash) rows for any relation
    * carrying `doc_id` + `text` — the same ShingleK/Bands/RowsPerBand
    * expressions as the batch pipeline, usable on a STREAMING input
    * (stateless per row). [[graft.streaming.CorpusStream]] probes the
    * batch-built band index with this.
    */
  private[graft] def bandRows(docs: DataFrame,
                              passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    docs
      .select(col("doc_id") +: keep :+ normText(col("text")).as("nt"): _*)
      .select(col("doc_id") +: keep :+ charShingles(col("nt"), ShingleK).as("sh"): _*)
      .select(col("doc_id") +: keep :+
        posexplode(graft.functions.MinHashBands(col("sh"), Bands, RowsPerBand))
          .as(Seq("band", "bh")): _*)
  }

  /** Hot-bucket cap audit: how many (band, bh) buckets — and how many
    * band rows inside them — a cap of `cap` skips for `docs`. The cap
    * bounds the LSH self-join against boilerplate buckets
    * (O(bucket²) pair explosion), but silent truncation is the one
    * smell in an otherwise honest pipeline: a 100 TB operator must be
    * able to see what the cap dropped. Returns (n_buckets, n_rows) and
    * logs one structured line (WARN when anything was skipped, INFO
    * when the cap was inert).
    */
  def logHotBucketAudit(docs: DataFrame, log: graft.etl.MigrationLog,
                        cap: Int = HotBucketCap): (Long, Long) = {
    val r = bandsFromShingles(shingleRows(docs))
      .groupBy("band", "bh").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > cap)
      .agg(count(lit(1)).as("n_buckets"),
        coalesce(sum(col("bsz")), lit(0L)).as("n_rows"))
      .collect()(0)
    val (nBuckets, nRows) = (r.getLong(0), r.getLong(1))
    val msg = s"hot_bucket_cap=$cap skipped_buckets=$nBuckets skipped_rows=$nRows"
    if (nBuckets > 0) log.warn("documents", "lsh_dedup", msg)
    else log.info("documents", "lsh_dedup", msg)
    (nBuckets, nRows)
  }

  /** Candidate pairs from the bucket-capped LSH self-join, each with its
    * EXACT Jaccard — the pre-threshold stage (q_dedup_recall measures
    * this stage's precision/recall); [[minhashPairs]] applies the verify
    * threshold on top.
    *
    * Candidate pairs come from a bucket-capped SELF-JOIN on (band, bh) —
    * not collect_set+explode, which builds an unbounded in-memory
    * array per bucket and O(bucket²) pairs for a hot boilerplate
    * bucket. The bucket-size cap (skip, don't expand, boilerplate
    * buckets at HotBucketCap) is stamped via the skew-safe
    * [[BandIndex.withKeyCount]] groupBy + join-back (r17 verdict #1:
    * the previous `count over (partition by band, bh)` window made the
    * hottest band bucket — exactly the boilerplate class the cap
    * exists FOR — one unsplittable task at scale). Trade, measured on
    * the executed plan (r18): join-back costs ONE extra exchange — the
    * groupBy's map-side-combined partial counts, one row per (band,
    * bh) per map partition — while the self-join legs still share one
    * exchange via ReuseExchange (both legs are the identical capped
    * subplan; verified `ReusedExchange` over the capped relation's
    * hashpartitioning(band, bh)). join-back references `bands` twice,
    * but `bands` is the PERSISTED band relation (bandsPersisted), so
    * the second reference is a cache read. The exact-Jaccard verify
    * joins the (small) candidate set back to the shingle sets.
    */
  private def candidateJaccard(sh: DataFrame, bands: DataFrame): DataFrame = {
    val capped = BandIndex.withKeyCount(bands, Seq("band", "bh"), "bsz")
      .filter(col("bsz") > 1 && col("bsz") <= HotBucketCap)
      .select("doc_id", "band", "bh")
    val pairs = capped.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
      .join(capped.select(col("doc_id").as("doc_b"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        jaccard(col("sha"), col("shb")).as("j"))
  }

  /** Pre-threshold LSH candidates with exact Jaccard, PERSISTED — the
    * shared materialization point of the pair family: the verified-pair
    * consumers (q_doc_dedup / q_dedup_clusters via [[minhashPairs]]'s
    * filter) and q_doc_similar (which needs candidates BELOW the dedup
    * threshold too) all read this one cache, so the bucket join +
    * Jaccard verify runs once per session however many consumers.
    * (Persisting only the post-threshold pairs — the r5 shape — made
    * q_doc_similar re-run the whole verify pipeline: measured 4.5 s vs
    * ~0.3 s for the other cached consumers at sf0.1.) Candidates are
    * edges ≪ corpus at any scale; same cache-vs-recompute knob as the
    * shingle relation.
    */
  private def candidatesPersisted(s: org.apache.spark.sql.SparkSession,
                                  dir: String): DataFrame = {
    val sh = shinglesPersisted(s, dir)
    SharedCaches.track(SharedCaches.Minhash,
      candidateJaccard(sh, bandsPersisted(sh))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  private[ops] def minhashPairs(s: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame =
    candidatesPersisted(s, dir).filter(col("j") >= MinhashVerifyJ)

  /** DuckDB CTE chain ending in `cand(doc_a, doc_b, j)` — the oracle twin
    * of [[candidateJaccard]] (pre-threshold LSH candidates with exact
    * Jaccard), shared by the pair queries and q_dedup_recall.
    */
  private val candSqlCtes: String = {
    val bandHash = (1 to RowsPerBand).map(r => s"sg[$RowsPerBand*b+$r]")
      .mkString("md5(", "||", ")")
    s"""$shingleSqlCte,
       |hm AS (SELECT doc_id, sh, $materialSql AS hs FROM d),
       |sig AS (SELECT doc_id, sh, $sigSql AS sg FROM hm),
       |bands0 AS (SELECT doc_id, sh, b, $bandHash AS bh
       |  FROM sig, (SELECT unnest(range($Bands)) AS b)),
       |bands AS (SELECT * FROM bands0
       |  QUALIFY count(*) OVER (PARTITION BY b, bh)
       |    BETWEEN 2 AND $HotBucketCap),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /
       |      len(list_distinct(list_concat(a.sh,b.sh))) AS j
       |  FROM bands a JOIN bands b ON a.b=b.b AND a.bh=b.bh
       |    AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** CTE chain ending in `pairs(doc_a, doc_b, j)` — the oracle twin of
    * [[minhashPairs]], shared by q_doc_dedup and q_dedup_clusters.
    */
  /** SimHash fingerprint width. Widened 32 → 64 in r13 on
    * q_simhash_recall's OWN r12 measurement (precision 0.33 at 32 bits
    * — short docs collide; the measured table named "widen the
    * fingerprint, not the threshold" as the fix). The md5 already
    * yields 128 bits; 64 takes two bits per hex nibble.
    */
  private[ops] val SimhashBits = 64

  /** Manku et al. 2007 banding geometry for Hamming-k retrieval: the
    * 64-bit fingerprint splits into [[SimhashBands]] bands of 16 bits;
    * by pigeonhole, any pair at Hamming distance ≤ [[SimhashHamK]] =
    * SimhashBands − 1 agrees EXACTLY on at least one band — so the
    * band-equality join has recall 1.0 of the Hamming-≤k pair set by
    * construction — CONDITIONAL on the hot-bucket governance not
    * binding: simhashHammingPairs drops band buckets larger than
    * HotBucketCap, so a pair whose ONLY agreeing band lands in a
    * capped bucket is lost. Structural recall 1.0 therefore holds
    * exactly for pairs none of whose agreeing bands exceed the cap
    * (at the test scales no bucket reaches the cap — asserted in
    * DedupOpsSpec).
    */
  private[ops] val SimhashBands = 4
  private[ops] val SimhashHamK = SimhashBands - 1
  private val SimhashBandBits = SimhashBits / SimhashBands

  /** Per-doc 64-bit SimHash fingerprints (as a '0'/'1' bit-string — the
    * engine-portable representation both the equality window and the
    * banded Hamming join slice) — ONE definition for q_dedup_simhash's
    * clustering, q_dedup_simhash_hamming's candidates, and
    * q_simhash_recall's measurement. md5 is materialized ONCE per
    * token; the 64 bit-sums then slice the digest attribute (inlining
    * md5 into each sum would hash every token 64 times — subexpression
    * elimination does not reach across independent aggregate
    * expressions). Bit layout: positions 1–32 = nibble bit 3
    * (nibble ≥ 8), positions 33–64 = nibble bit 2 (nibble & 4) — two
    * independent bits per hex char of the digest.
    */
  private def simhashFps(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    // r18 (§1.2 per-task work): the 64 bit-sum aggregates previously
    // each re-sliced the 32-char hex digest per token row (substring +
    // two string compares ×64 ≈ the whole fingerprint pass's CPU).
    // The digest's 8 used hex chars per bit never change, so parse the
    // digest ONCE per row into four 32-bit integer chunks (8 hex chars
    // each — conv() is unsigned-safe at 32 bits where a single 64-bit
    // parse would wrap the Long cast) and make each bit-sum a shift/
    // mask on a long: bit i<32 is nibble i's 8-bit (hex '8'..'f'),
    // bit i>=32 is nibble (i−32)'s 4-bit (hex '4'..'7' or 'c'..'f') —
    // the identical bit the string compares extracted, now 64
    // codegen'd integer ops instead of 64 substring+compare chains.
    // sum(2·bit − 1) == the previous sum(when(bit,1).otherwise(-1)).
    def chunk(c: Int) =
      conv(substring(col("h"), 8 * c + 1, 8), 16, 10).cast("long").as(s"c$c")
    def bitOf(i: Int) = {
      val nib = i % 32           // hex-char position 0..31 left-to-right
      val off = if (i < 32) 3 else 2   // nibble bit the fingerprint uses
      shiftright(col(s"c${nib / 8}"), 4 * (7 - nib % 8) + off)
        .bitwiseAND(lit(1L))
    }
    val bitSums = (0 until SimhashBits).map(i =>
      sum(bitOf(i) * lit(2L) - lit(1L)).as(s"s$i"))
    val fp = concat((0 until SimhashBits).map(i =>
      when(col(s"s$i") > 0, lit("1")).otherwise(lit("0"))): _*)
    Tables.t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
      .select(col("doc_id"), chunk(0), chunk(1), chunk(2), chunk(3))
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  /** [[simhashFps]] persisted under its [[SharedCaches]] family: three
    * declared consumers (equality clustering, Hamming banding, the
    * recall measurement) share ONE fingerprint corpus pass per session
    * — CacheManager matches the canonicalized plan, so each call's
    * persist() lands on the same materialization.
    */
  private def simhashFpsPersisted(s: org.apache.spark.sql.SparkSession,
                                  dir: String): DataFrame =
    SharedCaches.track(SharedCaches.Simhash,
      simhashFps(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** DuckDB twin of [[simhashFps]] ending in `fp(doc_id, simhash)`. */
  private val simhashFpSqlCtes: String = {
    def hitSql(i: Int) = {
      val c = s"substr(md5(tok),${(i % 32) + 1},1)"
      if (i < 32) s"$c >= '8'"
      else s"(($c BETWEEN '4' AND '7') OR $c >= 'c')"
    }
    val bitSums = (0 until SimhashBits).map(i =>
      s"SUM(CASE WHEN ${hitSql(i)} THEN 1 ELSE -1 END) AS s$i")
      .mkString(", ")
    val fp = (0 until SimhashBits).map(i =>
      s"CASE WHEN s$i > 0 THEN '1' ELSE '0' END").mkString("||")
    s"""sh_t AS (SELECT doc_id, unnest(string_split($normSql,' ')) AS tok FROM documents),
       |sh_sums AS (SELECT doc_id, $bitSums FROM sh_t GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fp AS simhash FROM sh_sums)""".stripMargin
  }

  /** Hamming distance between two 64-bit fingerprint bit-strings, as
    * two 32-bit halves (each half parses into a long without sign
    * trouble): popcount(xor) per half, summed. Codegen'd built-ins
    * end-to-end — conv/bit_count, no UDF.
    */
  private def hammingFp(a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def half(c: org.apache.spark.sql.Column, off: Int) =
      conv(substring(c, off, 32), 2, 10).cast("long")
    bit_count(half(a, 1).bitwiseXOR(half(b, 1))) +
      bit_count(half(a, 33).bitwiseXOR(half(b, 33)))
  }

  /** DuckDB twin of [[hammingFp]] (0b-prefixed binary cast + xor). */
  private def hammingFpSql(a: String, b: String): String = {
    def half(c: String, off: Int) =
      s"CAST('0b' || substr($c, $off, 32) AS BIGINT)"
    s"(bit_count(xor(${half(a, 1)}, ${half(b, 1)})) + " +
      s"bit_count(xor(${half(a, 33)}, ${half(b, 33)})))"
  }

  /** Hamming-≤k SimHash near-dup pairs via Manku banding — ONE
    * definition for q_dedup_simhash_hamming and q_simhash_recall's
    * hamming variant. Candidates are a band-equality equi-join (the
    * minhash LSH skeleton on simhash bands: window-counted buckets,
    * singletons skipped, hot buckets capped at [[HotBucketCap]] — a
    * 16-bit band of boilerplate-heavy corpora can degenerate exactly
    * like a minhash band bucket); verify is the exact popcount on the
    * two fingerprints already riding the join — no second corpus pass.
    */
  private def simhashHammingPairs(s: org.apache.spark.sql.SparkSession,
                                  dir: String): DataFrame = {
    // Bucket sizes via the skew-safe groupBy + join-back (r17 verdict
    // #1 — a 16-bit boilerplate band bucket is the same Zipf head as a
    // minhash bucket); the banded relation derives from the PERSISTED
    // fingerprint cache, so the join-back's second reference re-slices
    // cached rows rather than re-running the fingerprint corpus pass.
    // r18 (§1.2 per-task work): the popcount verify previously parsed
    // the two 64-char fingerprint bit-strings per CANDIDATE PAIR (four
    // conv() string parses, and twice over — once in the join
    // condition, once in the projection). The two long halves are now
    // hoisted onto the per-doc band rows (2 convs per doc·band row,
    // not 4 per pair), so the per-pair verify is pure integer
    // xor/popcount — same hamming value by construction.
    def half(off: Int) =
      conv(substring(col("simhash"), off, 32), 2, 10).cast("long")
    val bands = BandIndex.withKeyAgg(
      simhashFpsPersisted(s, dir).select(col("doc_id"),
        half(1).as("h1"), half(33).as("h2"),
        posexplode(array((0 until SimhashBands).map(b =>
          substring(col("simhash"), b * SimhashBandBits + 1, SimhashBandBits))
          : _*)).as(Seq("b", "bk"))),
      Seq("b", "bk"), Seq(count(lit(1)).as("bsz")))
      .filter(col("bsz").between(2, HotBucketCap))
    val x = bands.select(col("doc_id").as("doc_a"),
      col("h1").as("ha1"), col("h2").as("ha2"), col("b"), col("bk"))
    val y = bands.select(col("doc_id").as("doc_b"),
      col("h1").as("hb1"), col("h2").as("hb2"), col("b"), col("bk"))
    x.join(y, Seq("b", "bk"))
      .filter(col("doc_a") < col("doc_b"))
      // popcount BEFORE the pair-dedup: the verify is a few codegen'd
      // integer ops, so paying it per duplicate candidate is cheaper
      // than shuffling two 64-char fingerprints through the DISTINCT
      // exchange — the dedup key is (id, id, tiny int), 128+ chars
      // narrower per row (a multi-band hit duplicates rows, and each
      // copy computes the SAME hamming, so distinct-after is exact)
      .withColumn("hamming",
        (bit_count(col("ha1").bitwiseXOR(col("hb1"))) +
          bit_count(col("ha2").bitwiseXOR(col("hb2")))).cast("long"))
      .filter(col("hamming") <= SimhashHamK)
      .select("doc_a", "doc_b", "hamming").distinct()
  }

  /** [[simhashHammingPairs]] persisted under the Simhash family (r18,
    * §3.3/§5): the pair set is read three times across its two
    * declared consumers (q_dedup_simhash_hamming's output, and
    * q_simhash_recall's n_pairs agg + hit semi-join), and each
    * reference previously re-ran the banding + self-join + popcount
    * verify. Pair-set-sized (edges ≪ corpus) at any scale.
    */
  private def simhashHammingPersisted(s: org.apache.spark.sql.SparkSession,
                                      dir: String): DataFrame =
    SharedCaches.track(SharedCaches.Simhash,
      simhashHammingPairs(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** DuckDB twin of [[simhashHammingPairs]] ending in
    * `shham(doc_a, doc_b, hamming)`; callers must have
    * [[simhashFpSqlCtes]] in scope.
    */
  private val simhashHammingSqlCtes: String = {
    val bandExprs = (0 until SimhashBands).map(b =>
      s"substr(simhash, ${b * SimhashBandBits + 1}, $SimhashBandBits)")
      .mkString(", ")
    s"""shb0 AS (SELECT doc_id, simhash, b, bk FROM (
       |    SELECT doc_id, simhash,
       |      unnest(range($SimhashBands)) AS b,
       |      unnest([$bandExprs]) AS bk
       |    FROM fp)),
       |shb AS (SELECT * FROM shb0
       |  QUALIFY count(*) OVER (PARTITION BY b, bk)
       |    BETWEEN 2 AND $HotBucketCap),
       |shcand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    x.simhash AS fa, y.simhash AS fb
       |  FROM shb x JOIN shb y ON x.b = y.b AND x.bk = y.bk
       |    AND x.doc_id < y.doc_id),
       |shham AS (SELECT DISTINCT doc_a, doc_b,
       |    CAST(${hammingFpSql("fa", "fb")} AS BIGINT) AS hamming
       |  FROM shcand
       |  WHERE ${hammingFpSql("fa", "fb")} <= $SimhashHamK)""".stripMargin
  }

  private[ops] val pairsSqlCtes: String =
    s"""$candSqlCtes,
       |pairs AS (SELECT * FROM cand WHERE j >= $MinhashVerifyJ)""".stripMargin

  /** Recursive-CC chain over `pairs` ending in `cc(doc_id, cluster_id)`
    * — the oracle twin of [[minhashComponents]], ONE definition for
    * every cluster-consuming oracle (clusters, keep-best, cluster-aware
    * split) so the replays cannot drift. Callers must open their WITH
    * as `WITH RECURSIVE`.
    */
  private[ops] val ccSqlCtes: String =
    """edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      |  UNION ALL SELECT doc_b, doc_a FROM pairs),
      |walk(doc_id, reach) AS (
      |  SELECT DISTINCT src, src FROM edges
      |  UNION
      |  SELECT w.doc_id, e.dst FROM walk w JOIN edges e ON e.src = w.reach),
      |cc AS (SELECT doc_id, min(reach) AS cluster_id FROM walk GROUP BY doc_id)""".stripMargin

  /** Fixed iteration count for the min-label propagation VARIANT
    * ([[connectedComponents]]): covers any component of graph diameter
    * <= CcIters. Kept for tests and for graphs whose diameter is known
    * a-priori; the DECLARED cluster query runs [[clusterComponents]]
    * (star contraction with convergence detection), which is exact at
    * ANY diameter — a diameter-5 chain of partial overlaps in a 100x
    * corpus would silently split under a fixed bound, and no audit
    * would catch it.
    */
  private[ops] val CcIters = 4

  /** Round cap for the star-contraction fixpoint. Rounds needed grow
    * with log2(component diameter) (Kiveris et al.), so 16 covers any
    * component a physical corpus could produce (diameter ~2^16 via
    * chained partial overlaps); convergence detection exits far earlier
    * on real graphs (sf0.1 pair graph: 3 rounds). The cap is a runaway
    * guard, not a correctness bound.
    */
  private[ops] val CcStarMaxIters = 16

  /** The DECLARED connected-components path for q_dedup_clusters:
    * star contraction run to the star-forest fixpoint — exact at any
    * component diameter, unlike the fixed-round propagation
    * ([[connectedComponents]]) it replaced, which silently under-merges
    * any component with diameter > iters. DedupOpsSpec carries the
    * differential: a diameter-6 chain the fixed-4 propagation FAILS and
    * this path labels correctly.
    */
  def clusterComponents(edges: DataFrame): DataFrame =
    connectedComponentsStar(edges, CcStarMaxIters)

  /** CC labels (doc_id, cluster_id) over the verified minhash pair
    * graph, shared by q_dedup_clusters and q_dedup_keep_best. The
    * star-contraction fixpoint runs its rounds at CONSTRUCTION time
    * (driver-side loop over checkpointed edge sets), so plan-level
    * caching cannot dedup it — the constructed, persisted label
    * relation is memoized per (session, dir) and evicted with the
    * minhash family's release (measured before sharing: keep_best
    * re-paid the full fixpoint, 1.97 s at sf0.1 for labels the
    * clusters query had already computed).
    */
  private val ccMemo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, String), DataFrame]

  private[ops] def minhashComponents(
      s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    // synchronized (r18 ADVICE #4 pattern): the initializer runs the CC
    // fixpoint and registers persist/track/onRelease — must run once
    // even if consumers arrive from concurrent driver threads.
    ccMemo.synchronized { ccMemo.getOrElseUpdate((s, dir), {
      val labels = SharedCaches.track(SharedCaches.Minhash,
        clusterComponents(minhashPairs(s, dir)
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
          .select(col("id").as("doc_id"), col("component").as("cluster_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      SharedCaches.onRelease(SharedCaches.Minhash) { () =>
        ccMemo.remove((s, dir))
        // the label plan reads the star fixpoint's FINAL checkpointed
        // edge set (a LogicalRDD leaf) — free those blocks with the
        // family; nothing reads the labels after their release point
        Checkpoints.free(labels)
      }
      labels
    }) }

  /** Connected components over an undirected edge list (`src`, `dst`) by
    * `iters` rounds of min-label propagation: label(x) := min(label(x),
    * min over neighbors' labels). Exact for any component whose diameter
    * is <= iters; one declarative plan (each round = equi-join + min-agg),
    * no driver-side convergence loop. Returns (id, component) where
    * component = min node id reachable within iters hops.
    */
  def connectedComponents(edges: DataFrame, iters: Int): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = sym.select(col("src")).distinct()
    // Self-loops fold the "keep my own label" term into the neighbor min,
    // so each round is ONE join + agg referencing the previous labels
    // exactly once — linear lineage. (The naive `lbl.union(join(lbl))`
    // references lbl twice per round: a 2^iters-leaf plan where every
    // leaf re-derives the upstream edge pipeline — measured 27 s vs
    // ~1 s at sf0.1.) The edge relation is read once per round, so it is
    // persisted: the standard Spark shape for iterative graph algorithms
    // (GraphX/GraphFrames cache per-iteration state the same way). Edges
    // here are the verified near-dup pairs — orders of magnitude smaller
    // than the corpus at any scale.
    val symSelf = sym.union(nodes.select(col("src"), col("src").as("dst"))).persist()
    // Seed labels from the cached self-loops — NOT from `nodes`, whose
    // plan would re-derive the whole upstream edge pipeline a second
    // time (the distinct inside symSelf is computed once, during cache
    // materialization; this filter is a scan of the cache).
    var lbl = symSelf.filter(col("src") === col("dst"))
      .select(col("src").as("id"), col("src").as("component"))
    for (_ <- 1 to iters) {
      lbl = symSelf.join(lbl, symSelf("dst") === lbl("id"))
        .groupBy(symSelf("src"))
        .agg(min(col("component")).as("component"))
        .select(col("src").as("id"), col("component"))
    }
    // The returned plan references the cached edges, so they cannot be
    // unpersisted lazily — cut the lineage with an eager localCheckpoint
    // (driver-side iterative variant; the declared path is
    // clusterComponents) and release the edge cache immediately instead
    // of leaking one CacheManager entry per invocation.
    val out = lbl.localCheckpoint(true)
    symSelf.unpersist()
    out
  }

  /** Connected components by alternating large-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — the 100 TB path that [[connectedComponents]]'s Scaladoc
    * points to: rounds needed scale with log(diameter) instead of
    * diameter, so adversarial chain-shaped components converge in a
    * handful of rounds where min-label propagation needs diameter-many.
    *
    * One round = large-star (every node's strictly-larger neighbors
    * re-hang onto the min of its closed neighborhood) then small-star
    * (every node and its <=-neighbors re-hang onto the min of that
    * side). Both are the same two primitives as propagation — groupBy
    * min + equi-join — so the physical plans shuffle identically. Runs
    * to the star-forest fixpoint (edge set unchanged) or `maxIters`,
    * whichever first; the property spec checks exactness against
    * union-find on adversarial chains, cliques, and random graphs.
    * Returns (id, component), component = min node id of the component.
    * Nodes appearing in no edge are absent (as in
    * [[connectedComponents]]) — callers union isolated nodes back if
    * needed.
    */
  def connectedComponentsStar(edges: DataFrame, maxIters: Int): DataFrame = {
    // Canonical direction u > v (parent pointers point toward smaller
    // ids); self-loops dropped. Each round eagerly localCheckpoints its
    // edge set: a round references the previous one SEVERAL times (sym
    // twice, the star joins again), so without lineage TRUNCATION the
    // logical plan grows exponentially in rounds — persist() caches data
    // but not the analyzed plan, and explain/planning itself OOMs after
    // ~10 rounds. Checkpoint-per-round is the standard shape for
    // iterative fixpoint algorithms (GraphFrames CC does exactly this);
    // superseded checkpoints are dropped by the ContextCleaner when
    // dereferenced.
    // counted checkpoint (r19): the eager materialization already
    // counts the RDD — reuse it instead of a second count() job per
    // round (the loop is driver-dispatch-bound on edge-set-sized data)
    var (e, eCount) = GraftSqlBridge.freshLocalCheckpointCounted(edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    // Iteration parallelism follows the MEASURED edge count (known free
    // from the convergence check): near-dup pair graphs are orders of
    // magnitude smaller than the corpus, and full shuffle-width rounds
    // on a few hundred edges pay ~32 near-empty tasks per job, several
    // jobs per round — pure dispatch latency. Billions of edges keep
    // full width; the clamp only ever shrinks.
    val fullWidth = edges.sparkSession.sessionState.conf.numShufflePartitions
    def parts(n: Long): Int =
      math.max(1L, math.min(fullWidth.toLong, n / 100000L + 1L)).toInt
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      round += 1
      // large-star: for every node u, hang each strictly-LARGER neighbor
      // onto m(u) = min(Γ(u) ∪ {u}).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val afterLarge = sym.join(lmins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // small-star: on the now-canonical edges (v < u), hang u and all
      // its smaller neighbors onto m(u) = min(Γ≤(u) ∪ {u}) = min(Γ≤(u)).
      val smins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      val (next, nextCount) = GraftSqlBridge.freshLocalCheckpointCounted(
        afterLarge.join(smins, "u")
          .select(col("v").as("u"), col("m").as("v"))
          .union(smins.select(col("u"), col("m").as("v")))
          .filter(col("u") =!= col("v")).distinct()
          .repartition(parts(eCount)))
      converged = nextCount == eCount && next.except(e).isEmpty
      // next is materialized (eager checkpoint) and the except above was
      // the last read of the previous round — free its blocks now
      // instead of waiting for the GC-driven ContextCleaner.
      Checkpoints.free(e)
      e = next
      eCount = nextCount
    }
    // At fixpoint e is a star forest: one (node, component-min) edge per
    // non-root node. groupBy-min also yields a defined (if approximate)
    // answer when maxIters stopped a not-yet-converged run.
    val roots = e.select(col("v")).except(e.select(col("u")))
      .select(col("v").as("id"), col("v").as("component"))
    e.select(col("u").as("id"), col("v").as("component"))
      .groupBy("id").agg(min(col("component")).as("component"))
      .union(roots).distinct()
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------- H1
    QueryDef(
      "q_dedup_exact",
      "Exact dedup: hash groupBy on the BINARY 128-bit fingerprint of " +
        "normalized text, keep min doc_id (partial agg -> one shuffle " +
        "whose key is 16 bytes, not whole documents and not the 32-char " +
        "hex rendering — at 100 TB the shuffle write shrinks by the " +
        "mean document length / 16; salt only if a single text value " +
        "dominates). The hex prefix is re-derived only for the report.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .groupBy(unhex(md5(normText(col("text")))).as("fp"))
          .agg(min(col("doc_id")).as("keeper_id"),
            count(lit(1)).as("n_copies"))
          .select(col("keeper_id"), col("n_copies"),
            substring(lower(hex(col("fp"))), 1, 16).as("text_fp"))
          .orderBy("keeper_id")
      },
      Some(s"""WITH g AS (SELECT unhex(md5($normSql)) AS fp, doc_id FROM documents)
              |SELECT min(doc_id) AS keeper_id, COUNT(*) AS n_copies,
              |  substr(lower(hex(fp)), 1, 16) AS text_fp
              |FROM g GROUP BY fp ORDER BY keeper_id""".stripMargin)
    ),

    // ------------------------------------------------------------- H3
    QueryDef(
      "q_doc_dedup",
      "MinHash+LSH near-dup detection: shingle -> 12 seeded-md5 minhashes " +
        "-> 3 bands of 4 -> bucket equi-join -> exact-Jaccard verify. " +
        "The all-pairs problem becomes a join on (band, band_hash).",
      // Stage 1+2 fused: shingles -> 12 minhashes -> 3 band hashes in ONE
      // native pass (graft.functions.MinHashBands; bit-identical to the
      // HOF/DuckDB formulation). The previous element_at(sig, i)-per-band
      // formulation let CollapseProject inline the signature subtree into
      // every band hash — the md5 scan over all shingles ran once per
      // band reference instead of once per document. Pipeline shared with
      // q_dedup_clusters via minhashPairs.
      (s, dir) => minhashPairs(s, dir)
        .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH $pairsSqlCtes
              |SELECT doc_a, doc_b, round(j,6) AS jaccard FROM pairs
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ------------------------------------------------------------ H3r
    QueryDef(
      "q_doc_similar",
      "Most-similar-document retrieval: for every doc with at least one " +
        "LSH candidate, its single closest neighbor by exact Jaccard " +
        "(the related-documents lookup a curation UI runs, and the " +
        "text-side analogue of q_embedding_topk at k=1). Reuses the " +
        "production MinHash bucket pipeline — candidates come from the " +
        "banded equi-join, never all-pairs — symmetrized, then a " +
        "per-doc top-1 window that WindowGroupLimit prunes to one row " +
        "per doc BEFORE the exchange; ties resolve (j desc, id asc).",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val cand = candidatesPersisted(s, dir)
        val sym = cand.select(col("doc_a").as("doc_id"),
            col("doc_b").as("other_id"), col("j"))
          .union(cand.select(col("doc_b").as("doc_id"),
            col("doc_a").as("other_id"), col("j")))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("j").desc, col("other_id").asc)
        sym.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("other_id").as("similar_id"),
            round(col("j"), 6).as("similarity"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $candSqlCtes,
              |sym AS (SELECT doc_a AS doc_id, doc_b AS other_id, j FROM cand
              |  UNION ALL SELECT doc_b, doc_a, j FROM cand),
              |r AS (SELECT doc_id, other_id, j,
              |    ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY j DESC, other_id ASC) AS rn
              |  FROM sym)
              |SELECT doc_id, other_id AS similar_id, round(j,6) AS similarity
              |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin)
    ),

    // ------------------------------------------------------------ H3m
    QueryDef(
      "q_dedup_recall",
      "Measured precision/recall of the LSH CANDIDATE stage against " +
        "exact all-pairs Jaccard ground truth on a fixed doc panel " +
        s"(id % $RecallMod == 0 or id < $RecallPrefix) — the number " +
        "that makes the banding parameters falsifiable (the dedup " +
        "analogue of q_ann_recall): recall counts true near-dup pairs " +
        "the bucket join surfaces, precision the fraction of " +
        "candidates that verify. Ground truth is a deliberate " +
        "exact-baseline cross join bounded to the panel; the candidate " +
        "side reuses the production bucket pipeline with the panel " +
        "filter pushed into both self-join legs.",
      (s, dir) => {
        def inPanel(c: org.apache.spark.sql.Column) =
          c % RecallMod === 0 || c < RecallPrefix
        val sh = shinglesPersisted(s, dir)
        // r18 (§5): the candidate side IS the persisted candidate
        // relation the pair family shares (same candidateJaccard over
        // the same cached shingles/bands; the panel filter commutes
        // with the pipeline — it references only the output pair ids),
        // so read the cache instead of re-running the capped self-join
        // + exact-Jaccard verify per execution.
        val candJ = candidatesPersisted(s, dir)
          .filter(inPanel(col("doc_a")) && inPanel(col("doc_b")))
        val samp = sh.filter(inPanel(col("doc_id")))
        val truth = samp.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
          .join(broadcast(
            samp.select(col("doc_id").as("doc_b"), col("sh").as("shb"))),
            col("doc_a") < col("doc_b"))
          .select(jaccard(col("sha"), col("shb")).as("j"))
          .filter(col("j") >= MinhashVerifyJ)
        val m1 = samp.agg(count(lit(1)).as("n_panel_docs"))
        val m2 = truth.agg(count(lit(1)).as("n_true_pairs"))
        val m3 = candJ.agg(count(lit(1)).as("n_candidates"),
          sum(when(col("j") >= MinhashVerifyJ, 1).otherwise(0))
            .cast("long").as("n_hits"))
        // Zero-denominator guards: an empty candidate or truth set would
        // otherwise emit NULL and silently void the falsifiability
        // metric this query exists to provide. Convention: no candidates
        // -> no false positives -> precision 1.0; no true pairs -> none
        // missed -> recall 1.0 (the vacuous-truth convention, mirrored
        // in the oracle).
        m1.crossJoin(m2).crossJoin(m3)
          .select(col("n_panel_docs"), col("n_true_pairs"),
            col("n_candidates"), col("n_hits"),
            when(col("n_candidates") > 0,
              round(col("n_hits").cast("double") / col("n_candidates"), 6))
              .otherwise(1.0).as("precision"),
            when(col("n_true_pairs") > 0,
              round(col("n_hits").cast("double") / col("n_true_pairs"), 6))
              .otherwise(1.0).as("recall"))
      },
      Some(s"""WITH $candSqlCtes,
              |scand AS (SELECT * FROM cand
              |  WHERE (doc_a % $RecallMod = 0 OR doc_a < $RecallPrefix)
              |    AND (doc_b % $RecallMod = 0 OR doc_b < $RecallPrefix)),
              |samp AS (SELECT * FROM d
              |  WHERE doc_id % $RecallMod = 0 OR doc_id < $RecallPrefix),
              |truth AS (SELECT count(*) AS n_true_pairs
              |  FROM samp a JOIN samp b ON a.doc_id < b.doc_id
              |  WHERE CAST(len(list_intersect(a.sh,b.sh)) AS DOUBLE) /
              |    len(list_distinct(list_concat(a.sh,b.sh))) >= $MinhashVerifyJ),
              |m AS (SELECT (SELECT count(*) FROM samp) AS n_panel_docs,
              |    (SELECT n_true_pairs FROM truth) AS n_true_pairs,
              |    (SELECT count(*) FROM scand) AS n_candidates,
              |    (SELECT count(*) FILTER (j >= $MinhashVerifyJ) FROM scand)
              |      AS n_hits)
              |SELECT n_panel_docs, n_true_pairs, n_candidates, n_hits,
              |  CASE WHEN n_candidates > 0
              |    THEN round(CAST(n_hits AS DOUBLE)/n_candidates, 6)
              |    ELSE 1.0 END AS precision,
              |  CASE WHEN n_true_pairs > 0
              |    THEN round(CAST(n_hits AS DOUBLE)/n_true_pairs, 6)
              |    ELSE 1.0 END AS recall
              |FROM m""".stripMargin)
    ),

    // ------------------------------------------------------------ H3m'
    QueryDef(
      "q_dedup_tau_sweep",
      "Dedup threshold sweep — the table that PICKS tau (the H9w 'pick " +
        "L' pattern on the dedup knob): for each candidate Jaccard " +
        "threshold, the surviving pair count, the docs a greedy " +
        "drop-the-larger-id rule would remove, and the removed corpus " +
        "fraction. The removal column is the standard pairwise " +
        "estimate — an upper bound on cluster-keeper removal (the " +
        "exact transitive answer at the CHOSEN tau is q_dedup_clusters " +
        "+ q_dedup_keep_best; the sweep prices the candidates before " +
        "committing). Shape: everything is PAIR-grain — the sweep " +
        "rides the SAME cached banded-candidate relation as " +
        "q_doc_dedup (one fused conditional agg over it, thresholds " +
        "unpivoted from a 5-row array) plus a 1-row corpus count; " +
        "ZERO additional corpus passes at any scale.",
      (s, dir) => {
        val cand = candidatesPersisted(s, dir)
        val tot = Tables.t(s, dir, "documents")
          .agg(count(lit(1)).as("n_docs"))
        val aggs = TauSweep.zipWithIndex.flatMap { case (t, i) => Seq(
          sum(when(col("j") >= t, 1L).otherwise(0L)).as(s"p_$i"),
          count_distinct(when(col("j") >= t, col("doc_b"))).as(s"d_$i")) }
        val one = cand.agg(aggs.head, aggs.tail: _*)
          .crossJoin(broadcast(tot))
        val rows = TauSweep.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("tau"), col(s"p_$i").as("n_pairs"),
            col(s"d_$i").as("est_removed_docs"),
            round(col(s"d_$i").cast("double") / col("n_docs"), 6)
              .as("est_removed_frac")) }
        one.select(explode(array(rows: _*)).as("r"), col("n_docs"))
          .select(col("r.*"), col("n_docs"))
          .orderBy("tau")
      },
      Some {
        val arms = TauSweep.map(t =>
          s"""SELECT $t AS tau,
             |  CAST(SUM(CASE WHEN j >= $t THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_pairs,
             |  CAST(COUNT(DISTINCT CASE WHEN j >= $t THEN doc_b END)
             |    AS BIGINT) AS est_removed_docs
             |FROM cand""".stripMargin).mkString("\nUNION ALL\n")
        s"""WITH $candSqlCtes,
           |tot AS (SELECT COUNT(*) AS n_docs FROM documents),
           |sw AS ($arms)
           |SELECT tau, n_pairs, est_removed_docs,
           |  round(CAST(est_removed_docs AS DOUBLE) / n_docs, 6)
           |    AS est_removed_frac, n_docs
           |FROM sw CROSS JOIN tot ORDER BY tau""".stripMargin
      }
    ),

    // ------------------------------------------------------------- H3+
    QueryDef(
      "q_dedup_clusters",
      "Near-dup cluster consolidation: connected components over the " +
        "verified MinHash pair graph via alternating large-star/" +
        "small-star contraction run to the star-forest fixpoint " +
        "(Kiveris et al.) — exact at ANY component diameter (a fixed " +
        "round count silently splits chained-overlap components at " +
        "scale), log2(diameter) rounds of the same equi-join + min-agg " +
        "primitives; the keeper per cluster is its min doc_id.",
      (s, dir) => {
        // minhashPairs filters the persisted candidate relation, so the
        // star rounds' repeated references scan one materialized cache
        // instead of re-running the LSH+verify pipeline (measured 3x the
        // pair cost without it). The star rounds eagerly localCheckpoint
        // per round (lineage truncation — see connectedComponentsStar),
        // so the returned plan is the label relation over checkpointed
        // edges; the LSH pipeline cost is billed at checkpoint time,
        // inside the bench's timed region. cluster_size via the
        // skew-safe groupBy + join-back (r17 verdict #1): a CC
        // mega-component — chained boilerplate overlap, exactly what
        // star-contraction labels exactly — made the previous
        // cluster_id window one unsplittable task; both join-back
        // references read the checkpointed label relation.
        BandIndex.withKeyCount(minhashComponents(s, dir),
            Seq("cluster_id"), "cluster_size")
          .select("doc_id", "cluster_id", "cluster_size")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $pairsSqlCtes,
              |$ccSqlCtes
              |SELECT doc_id, cluster_id,
              |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
              |FROM cc ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_dedup_keep_best",
      "Quality-aware keeper election: per near-dup cluster (the same " +
        "star-contraction components as q_dedup_clusters), keep the " +
        "HIGHEST-quality member (q_quality_score's 0-3 gate, doc_id " +
        "tiebreak) instead of the min id — what production dedup " +
        "actually ships (Lee et al. 2022 keep one representative; " +
        "choosing the best copy, not an arbitrary one, is the point " +
        "of having a quality score). One argmax struct-max agg per " +
        "cluster over the CC labels joined doc-grain to the quality " +
        "gate — integer quality, no float ordering anywhere.",
      (s, dir) => {
        val cc = minhashComponents(s, dir)
        val toks = tokens(col("text"))
        val quality = Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            TextQueries.qualityPoints(length(col("text")), size(toks),
              TextQueries.nStop(toks)).as("qp"))
        cc.join(quality, "doc_id")
          .groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_size"),
            max(struct(col("qp"), (-col("doc_id")).as("nd"))).as("best"))
          .select(col("cluster_id"), col("cluster_size"),
            (-col("best.nd")).as("keeper_doc"),
            col("best.qp").as("keeper_quality"))
          .orderBy("cluster_id")
      },
      Some {
        val stop = TextQueries.stopwords.map(x => s"'$x'")
          .mkString("[", ",", "]")
        s"""WITH RECURSIVE $pairsSqlCtes,
           |$ccSqlCtes,
           |kb_t AS (SELECT doc_id, ${graft.functions.TextFunctions.toksSql} AS toks,
           |    length(text) AS n_chars FROM documents),
           |kb_qp AS (SELECT doc_id,
           |    (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
           |     + CASE WHEN len(list_filter(toks, x -> list_contains($stop, x))) > 0
           |       THEN 1 ELSE 0 END
           |     + CASE WHEN n_chars >= 64 THEN 1 ELSE 0 END) AS qp
           |  FROM kb_t),
           |kb_r AS (SELECT cluster_id, cc.doc_id, kb_qp.qp,
           |    ROW_NUMBER() OVER (PARTITION BY cluster_id
           |      ORDER BY kb_qp.qp DESC, cc.doc_id ASC) AS rn,
           |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
           |  FROM cc JOIN kb_qp ON cc.doc_id = kb_qp.doc_id)
           |SELECT cluster_id, cluster_size, doc_id AS keeper_doc,
           |  qp AS keeper_quality
           |FROM kb_r WHERE rn = 1 ORDER BY cluster_id""".stripMargin
      }
    ),

    // ------------------------------------------------------------ H3+h
    QueryDef(
      "q_cluster_size_hist",
      "Dup-graph cluster-size histogram — the governance summary a " +
        "dedup review reads before committing to a removal policy: per " +
        "cluster size, how many near-dup clusters and docs, plus the " +
        "singleton row (docs in NO verified pair: corpus minus labeled " +
        "docs — every labeled cluster has size >= 2 since each member " +
        "has a partner edge). A heavy tail here means template spam " +
        "(one giant component); mass at size 2 means benign mirror " +
        "pairs — the distribution picks between keeper election and " +
        "cluster-cap policies. Shape: rides the SAME memoized CC " +
        "labels as q_dedup_clusters (star-contraction fixpoint, built " +
        "once per session — ZERO extra corpus passes), one " +
        "cluster-grain agg, then a histogram agg on the cluster-count " +
        "relation (bounded by distinct sizes); singleton accounting is " +
        "two 1-row aggs cross-joined. At 100 TB every stage after the " +
        "shared labels is sub-relational.",
      (s, dir) => {
        val cc = minhashComponents(s, dir)
        val tot = Tables.t(s, dir, "documents")
          .agg(count(lit(1)).as("n_total"))
        val hist = cc.groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("cluster_size"), col("n_clusters"),
            (col("cluster_size") * col("n_clusters")).as("n_docs"))
        val singles = tot.crossJoin(cc.agg(count(lit(1)).as("n_labeled")))
          .select(lit(1L).as("cluster_size"),
            (col("n_total") - col("n_labeled")).as("n_clusters"),
            (col("n_total") - col("n_labeled")).as("n_docs"))
        singles.unionAll(hist)
          .crossJoin(broadcast(tot))
          .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
            round(col("n_docs").cast("double") / col("n_total"), 6)
              .as("frac_docs"))
          .orderBy("cluster_size")
      },
      Some(s"""WITH RECURSIVE $pairsSqlCtes,
              |$ccSqlCtes,
              |tot AS (SELECT COUNT(*) AS n_total FROM documents),
              |lab AS (SELECT COUNT(*) AS n_labeled FROM cc),
              |sz AS (SELECT cluster_id, COUNT(*) AS cluster_size
              |  FROM cc GROUP BY cluster_id),
              |h AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
              |    n_total - n_labeled AS n_clusters,
              |    n_total - n_labeled AS n_docs FROM tot CROSS JOIN lab
              |  UNION ALL
              |  SELECT cluster_size, COUNT(*) AS n_clusters,
              |    cluster_size * COUNT(*) AS n_docs
              |  FROM sz GROUP BY cluster_size)
              |SELECT cluster_size, n_clusters, n_docs,
              |  round(CAST(n_docs AS DOUBLE) / tot.n_total, 6) AS frac_docs
              |FROM h CROSS JOIN tot ORDER BY cluster_size""".stripMargin)
    ),

    // ------------------------------------------------------------- H3'
    QueryDef(
      "q_dedup_simhash",
      s"SimHash fingerprinting: $SimhashBits-bit bit-majority over " +
        "token md5s (one explode + groupBy; integer sums are " +
        "order-independent), then fingerprint-equality clustering. " +
        "Width 32 → 64 in r13, acting on q_simhash_recall's r12 " +
        "measurement (equality precision 0.33 at 32 bits — short docs " +
        "collided); at 64 bits equality is the high-precision face and " +
        "q_dedup_simhash_hamming carries the recall face (Hamming ≤ " +
        s"$SimhashHamK banding).",
      (s, dir) => {
        // Clustering via the skew-safe groupBy + join-back (r17 verdict
        // #1 adjudicated the previous simhash window by the withKeyAgg
        // rule): a boilerplate fingerprint class is one unsplittable
        // window partition at scale. The old window's one-shuffle /
        // no-double-eval defense is moot against the PERSISTED
        // fingerprint relation — both join-back references read the
        // cache, so the explode+md5+bit-sum pipeline still runs once.
        BandIndex.withKeyAgg(simhashFpsPersisted(s, dir), Seq("simhash"),
            Seq(count(lit(1)).as("cluster_size"),
              min("doc_id").as("cluster_min")))
          .select("doc_id", "simhash", "cluster_size", "cluster_min")
          .orderBy("doc_id")
      },
      Some {
        s"""WITH $simhashFpSqlCtes
           |SELECT doc_id, simhash,
           |  COUNT(*) OVER (PARTITION BY simhash) AS cluster_size,
           |  MIN(doc_id) OVER (PARTITION BY simhash) AS cluster_min
           |FROM fp ORDER BY doc_id""".stripMargin
      }
    ),

    // ------------------------------------------------------------ H3'h
    QueryDef(
      "q_dedup_simhash_hamming",
      s"SimHash Hamming-≤$SimhashHamK near-dup retrieval (Manku, Jain & " +
        "Das Sarma 2007 — the web-crawl near-dup detector): the " +
        s"$SimhashBits-bit fingerprint splits into $SimhashBands bands " +
        s"of $SimhashBandBits bits; by PIGEONHOLE any pair within " +
        s"Hamming $SimhashHamK agrees exactly on ≥1 band, so the " +
        "band-equality equi-join yields the COMPLETE Hamming-≤k pair " +
        "set by construction (recall 1.0 of its target set — the " +
        "structural guarantee LSH banding only gives probabilistically)" +
        ". Verify is the exact popcount on the two fingerprints " +
        "already riding the join (conv + bit_count on 32-bit halves — " +
        "codegen'd built-ins, no UDF, no second corpus pass). Buckets " +
        "window-counted: singletons skipped, hot bands capped at " +
        s"$HotBucketCap (a 16-bit band over boilerplate-heavy corpora " +
        "degenerates exactly like a minhash band bucket — same " +
        "governance). At 100 TB: candidates are an equi-join on " +
        "bounded buckets shuffling (id, 64-bit fp) pairs only; the " +
        "fingerprint pass is the one corpus scan.",
      (s, dir) => simhashHammingPersisted(s, dir).orderBy("doc_a", "doc_b"),
      Some {
        s"""WITH $simhashFpSqlCtes,
           |$simhashHammingSqlCtes
           |SELECT doc_a, doc_b, hamming FROM shham
           |ORDER BY doc_a, doc_b""".stripMargin
      }
    ),

    // ------------------------------------------------------------ H3me
    QueryDef(
      "q_minhash_est_error",
      s"MEASURED MinHash estimator error (Broder 1997's guarantee " +
        "turned into a number on THIS corpus and THIS signature " +
        s"geometry): over the cached LSH candidate pairs, Ĵ = " +
        s"(matching components)/$NumHashes is compared against the " +
        "exact Jaccard the verify leg already computed, binned by " +
        "exact-J quintile via floor(J*5) — bins 0–4 cover [0,1), and " +
        "exact duplicates (J = 1.0) land in their OWN bin 5 (pinned in " +
        "DedupOpsSpec), deliberately NOT folded into bin 4 so the " +
        "perfect-agreement population never dilutes the top " +
        "quintile's bias read — per bin: pair count, mean J, mean Ĵ, mean " +
        "|Ĵ−J| and the signed bias. Measured at sf0.01 the table says " +
        "something sharper than the textbook σ ≈ √(J(1−J)/12) ≈ 0.14: " +
        "candidate-CONDITIONED signatures are upward-biased at low J " +
        "(bin 0: mean J 0.18 vs mean Ĵ 0.45, bias +0.27 — pairs become " +
        "candidates BECAUSE a band agreed, so their signatures " +
        "over-agree by selection) while true near-dups measure almost " +
        "exactly (bin 4: bias −0.0005, |err| 0.03). The verify step is " +
        "therefore LOAD-BEARING as measured fact, not folklore — " +
        "thresholding on Ĵ alone would pass swarms of low-J pairs — " +
        "the q_ann_recall honesty convention applied to the signature " +
        "itself. Shape: rides the " +
        "SAME cached shingle/candidate relations as q_doc_dedup (zero " +
        "extra corpus passes); signatures join candidate pairs on " +
        "doc_id (narrow rows), means are 9dp-rounded DECIMAL sums.",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val sig = shinglesPersisted(s, dir).select(col("doc_id"),
          graft.functions.MinHashSignature(col("sh"), NumHashes).as("sg"))
        val est = candidatesPersisted(s, dir)
          .join(sig.select(col("doc_id").as("doc_a"), col("sg").as("sga")),
            "doc_a")
          .join(sig.select(col("doc_id").as("doc_b"), col("sg").as("sgb")),
            "doc_b")
          .withColumn("est",
            expr(s"size(filter(sequence(1, $NumHashes), " +
              "i -> element_at(sga, i) = element_at(sgb, i)))")
              .cast("double") / NumHashes)
        val dec = DecimalType(38, 12)
        def mean6(c: org.apache.spark.sql.Column) =
          round(sum(round(c, 9).cast(dec)).cast("double") / count(lit(1)), 6)
        est.select(floor(col("j") * 5).cast("int").as("j_bin"),
            col("j"), col("est"))
          .groupBy("j_bin")
          .agg(count(lit(1)).as("n_pairs"),
            mean6(col("j")).as("mean_j"),
            mean6(col("est")).as("mean_est"),
            mean6(abs(col("est") - col("j"))).as("mean_abs_err"),
            mean6(col("est") - col("j")).as("bias"))
          .orderBy("j_bin")
      },
      Some {
        def mean6(t: String) =
          s"round(CAST(sum(CAST(round($t, 9) AS DECIMAL(38,12))) " +
            "AS DOUBLE)/count(*), 6)"
        s"""WITH $candSqlCtes,
           |me AS (SELECT c.j,
           |    CAST(len(list_filter(range(1, ${NumHashes + 1}),
           |      i -> a.sg[i] = b.sg[i])) AS DOUBLE) / $NumHashes AS est
           |  FROM cand c JOIN sig a ON c.doc_a = a.doc_id
           |    JOIN sig b ON c.doc_b = b.doc_id)
           |SELECT CAST(floor(j * 5) AS INT) AS j_bin,
           |  count(*) AS n_pairs,
           |  ${mean6("j")} AS mean_j,
           |  ${mean6("est")} AS mean_est,
           |  ${mean6("abs(est - j)")} AS mean_abs_err,
           |  ${mean6("est - j")} AS bias
           |FROM me GROUP BY 1 ORDER BY j_bin""".stripMargin
      }
    ),

    // ------------------------------------------------------------ H3'm
    QueryDef(
      "q_simhash_recall",
      "MEASURED SimHash effectiveness against the engine's own verified " +
        "near-dup truth (the H3m pattern turned on H3'), now as a " +
        "TWO-VARIANT trade table (the τ-sweep discipline on the " +
        "retrieval rule): variant 'fp_equality' scores whole-" +
        s"fingerprint equality at $SimhashBits bits, variant " +
        s"'hamming_k$SimhashHamK' scores the Manku banded Hamming-≤" +
        s"$SimhashHamK pair set — each against the MinHash-VERIFIED " +
        "pairs (exact Jaccard ≥ the committed threshold, the same " +
        "cached truth q_doc_dedup publishes). History the table " +
        "records: at 32 bits (r12) equality measured recall 0.56 / " +
        "precision 0.33 — its own verdict forced the r13 widening. " +
        "Measured at 64 bits (sf0.01): fp_equality recall 0.12 / " +
        "precision 1.00 — the high-precision face restored (every " +
        "surviving collision is a true near-dup) at the expected " +
        "recall cost; hamming_k3 recall 0.72 / precision 0.50 — the " +
        "Hamming slack buys MORE recall than 32-bit equality ever had " +
        "(0.72 vs 0.56) at materially better precision (0.50 vs " +
        "0.33). Both r13 operating points dominate the r12 one on " +
        "their respective faces; which to ship is a τ-style choice " +
        "this table now prices. " +
        "Shape: both pair sets are equi-joins (fingerprint equality; " +
        "banded candidates), intersected on the pair key and reduced " +
        "to one row each — no all-pairs comparison anywhere; rides " +
        "the SAME cached candidate relation as q_doc_dedup/" +
        "q_dedup_recall, so the truth leg adds zero corpus passes.",
      (s, dir) => {
        val fps = simhashFpsPersisted(s, dir)
        // r18: eq is read twice below (n_pairs agg + hit semi-join) —
        // persist the pair set (edges ≪ corpus) like the hamming leg
        val eq = SharedCaches.track(SharedCaches.Simhash,
          fps.select(col("doc_id").as("doc_a"), col("simhash"))
            .join(fps.select(col("doc_id").as("doc_b"), col("simhash")),
              "simhash")
            .filter(col("doc_a") < col("doc_b"))
            .select("doc_a", "doc_b")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val ham = simhashHammingPersisted(s, dir).select("doc_a", "doc_b")
        val truth = minhashPairs(s, dir).select("doc_a", "doc_b")
        def row(pairs: DataFrame, variant: String): DataFrame = {
          val hit = truth.join(pairs, Seq("doc_a", "doc_b"), "left_semi")
          truth.agg(count(lit(1)).as("n_true_pairs"))
            .crossJoin(pairs.agg(count(lit(1)).as("n_pairs")))
            .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
            .select(lit(variant).as("variant"),
              col("n_true_pairs"), col("n_pairs"), col("n_hit"),
              when(col("n_true_pairs") > 0,
                round(col("n_hit").cast("double") / col("n_true_pairs"), 6))
                .otherwise(1.0).as("recall"),
              when(col("n_pairs") > 0,
                round(col("n_hit").cast("double") / col("n_pairs"), 6))
                .otherwise(1.0).as("precision"))
        }
        row(eq, "fp_equality")
          .unionAll(row(ham, s"hamming_k$SimhashHamK"))
          .orderBy("variant")
      },
      Some {
        def measured(rel: String, variant: String) =
          s"""SELECT '$variant' AS variant,
             |  (SELECT COUNT(*) FROM pairs) AS n_true_pairs,
             |  (SELECT COUNT(*) FROM $rel) AS n_pairs,
             |  (SELECT COUNT(*) FROM pairs p
             |     WHERE EXISTS (SELECT 1 FROM $rel r
             |       WHERE r.doc_a = p.doc_a AND r.doc_b = p.doc_b))
             |    AS n_hit""".stripMargin
        s"""WITH $pairsSqlCtes,
           |$simhashFpSqlCtes,
           |$simhashHammingSqlCtes,
           |sheq AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM fp a JOIN fp b ON a.simhash = b.simhash
           |    AND a.doc_id < b.doc_id),
           |m AS (
           |${measured("sheq", "fp_equality")}
           |UNION ALL
           |${measured("shham", s"hamming_k$SimhashHamK")})
           |SELECT variant, n_true_pairs, n_pairs, n_hit,
           |  CASE WHEN n_true_pairs > 0 THEN
           |    round(CAST(n_hit AS DOUBLE) / n_true_pairs, 6)
           |  ELSE 1.0 END AS recall,
           |  CASE WHEN n_pairs > 0 THEN
           |    round(CAST(n_hit AS DOUBLE) / n_pairs, 6)
           |  ELSE 1.0 END AS precision
           |FROM m ORDER BY variant""".stripMargin
      }
    ),

    // ------------------------------------------------------------- H3''
    QueryDef(
      "q_dedup_ngram",
      "Word-3-gram exact-Jaccard near-dup with min-gram blocking (the " +
        "lexicographic min gram is a 1-hash MinHash: recall ~= j for a " +
        "pair with Jaccard j, and the blocking key turns all-pairs into " +
        "an equi-join).",
      (s, dir) => {
        // staged: text -> tokens -> ngrams, each a materialized projection.
        // The emptiness guard runs on the CHEAP token stage, and block is
        // wrapped in coalesce to be non-nullable — otherwise Catalyst
        // pushes size(ng)>0 / IsNotNull(block) below the projections and
        // INLINES the full n-gram tree into a per-row scan filter
        // (re-evaluating it once per pushed predicate).
        val g = Tables.par(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), wordNgrams(col("toks"), 3).as("ng"))
          .withColumn("block", coalesce(array_min(col("ng")), lit("")))
        val a = g.select(col("doc_id").as("doc_a"), col("ng").as("nga"), col("block"))
        val b = g.select(col("doc_id").as("doc_b"), col("ng").as("ngb"), col("block"))
        a.join(b, "block")
          .filter(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            jaccard(col("nga"), col("ngb")).as("j"))
          .filter(col("j") >= NgramJ)
          .select(col("doc_a"), col("doc_b"), round(col("j"), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split($normSql,' ') AS w FROM documents),
              |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
              |    i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS ng
              |  FROM t WHERE len(w) >= 3),
              |k AS (SELECT doc_id, ng, list_aggregate(ng,'min') AS block FROM g)
              |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |  round(CAST(len(list_intersect(a.ng,b.ng)) AS DOUBLE) /
              |    len(list_distinct(list_concat(a.ng,b.ng))),6) AS jaccard
              |FROM k a JOIN k b ON a.block=b.block AND a.doc_id < b.doc_id
              |WHERE CAST(len(list_intersect(a.ng,b.ng)) AS DOUBLE) /
              |  len(list_distinct(list_concat(a.ng,b.ng))) >= $NgramJ
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ----------------------------------------------------------- H3+l
    QueryDef(
      "q_split_leakage",
      "Near-dup train/eval LEAKAGE audit: the deterministic 90/5/5 " +
        "hash split (q_data_split's exact bucket rule — one " +
        "definition) crossed with the verified near-dup pair graph " +
        "(the production MinHash pipeline). A near-dup pair whose " +
        "members land in DIFFERENT splits leaks eval content into " +
        "training — the contamination a memorization-prone eval " +
        "mistakes for generalization, and the reason dedup must run " +
        "BEFORE splitting (cluster-aware splits). Emits per " +
        "(split_lo, split_hi) class: verified-pair count, share of " +
        "all verified pairs, leak flag. Rides the cached candidate " +
        "family; the split label is a stateless per-row hash; the " +
        "share window runs on the reduced <=6-row class relation.",
      (s, dir) => {
        def splitOf(c: org.apache.spark.sql.Column) = {
          val bkt = conv(substring(md5(c.cast("string")), 1, 6), 16, 10)
            .cast("long") % 100
          when(bkt < 90, "train").when(bkt < 95, "val").otherwise("test")
        }
        val w = org.apache.spark.sql.expressions.Window.partitionBy()
        minhashPairs(s, dir)
          .withColumn("sa", splitOf(col("doc_a")))
          .withColumn("sb", splitOf(col("doc_b")))
          .select(least(col("sa"), col("sb")).as("split_lo"),
            greatest(col("sa"), col("sb")).as("split_hi"))
          .groupBy("split_lo", "split_hi")
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("share", round(col("n_pairs").cast("double") /
            sum(col("n_pairs")).over(w), 6))
          .withColumn("leaks",
            when(col("split_lo") =!= col("split_hi"), 1).otherwise(0))
          .orderBy("split_lo", "split_hi")
      },
      Some {
        def sq(c: String) =
          s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 6)) AS BIGINT) % 100"
        def cs(b: String) =
          s"CASE WHEN $b < 90 THEN 'train' WHEN $b < 95 THEN 'val' ELSE 'test' END"
        s"""WITH $pairsSqlCtes,
           |sp AS (SELECT least(ca, cb) AS split_lo,
           |    greatest(ca, cb) AS split_hi FROM (
           |  SELECT ${cs("ba")} AS ca, ${cs("bb")} AS cb FROM (
           |    SELECT ${sq("doc_a")} AS ba, ${sq("doc_b")} AS bb
           |    FROM pairs)))
           |SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
           |  round(CAST(count(*) AS DOUBLE) /
           |    (SELECT count(*) FROM pairs), 6) AS share,
           |  CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END AS leaks
           |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      }
    ),

    // ---------------------------------------------------------- H3+l'
    QueryDef(
      "q_split_cluster_aware",
      "Cluster-aware train/val/test split — the REMEDY the leakage " +
        "audit points to: the same 90/5/5 hash rule applied to each " +
        "doc's near-dup CLUSTER REPRESENTATIVE (the H3+ star-" +
        "contraction label; singleton docs are their own " +
        "representative), so every member of a near-dup cluster lands " +
        "in the same split BY CONSTRUCTION. Emits per split: docs, " +
        "distinct groups, and the leak check over the verified pair " +
        "graph — n_leaking is structurally 0 (a verified pair IS an " +
        "edge, so both ends share a cluster and therefore a split), " +
        "and the oracle + spec prove it rather than assert it. " +
        "Compare q_split_leakage's 28% crossing pairs under the " +
        "dedup-oblivious split.",
      (s, dir) => {
        def bktOf(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c.cast("string")), 1, 6), 16, 10)
            .cast("long") % 100
        def splitCase(b: org.apache.spark.sql.Column) =
          when(b < 90, "train").when(b < 95, "val").otherwise("test")
        val cc = minhashComponents(s, dir).select("doc_id", "cluster_id")
        val lab = Tables.t(s, dir, "documents").select("doc_id")
          .join(cc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("cluster_id"), col("doc_id")).as("rep"))
          .withColumn("split", splitCase(bktOf(col("rep"))))
        val splits = lab.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("rep")).as("n_groups"))
        val leaks = minhashPairs(s, dir)
          .join(lab.select(col("doc_id").as("doc_a"),
            col("split").as("sa")), "doc_a")
          .join(lab.select(col("doc_id").as("doc_b"),
            col("split").as("sb")), "doc_b")
          .agg(count(lit(1)).as("n_pairs"),
            sum(when(col("sa") =!= col("sb"), 1).otherwise(0))
              .cast("long").as("n_leaking"))
        splits.crossJoin(leaks)
          .select(col("split"), col("n_docs"), col("n_groups"),
            col("n_pairs"), col("n_leaking"))
          .orderBy("split")
      },
      Some {
        def sq(c: String) =
          s"CAST(('0x' || substr(md5(CAST($c AS VARCHAR)), 1, 6)) AS BIGINT) % 100"
        s"""WITH RECURSIVE $pairsSqlCtes,
           |$ccSqlCtes,
           |rep AS (SELECT dd.doc_id,
           |    coalesce(cc.cluster_id, dd.doc_id) AS rep
           |  FROM (SELECT doc_id FROM documents) dd
           |  LEFT JOIN cc ON dd.doc_id = cc.doc_id),
           |lab AS (SELECT doc_id, rep,
           |    CASE WHEN ${sq("rep")} < 90 THEN 'train'
           |         WHEN ${sq("rep")} < 95 THEN 'val'
           |         ELSE 'test' END AS split FROM rep),
           |sp AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(count(DISTINCT rep) AS BIGINT) AS n_groups
           |  FROM lab GROUP BY split),
           |lk AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           |    CAST(coalesce(sum(CASE WHEN la.split <> lb.split
           |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_leaking
           |  FROM pairs p JOIN lab la ON la.doc_id = p.doc_a
           |  JOIN lab lb ON lb.doc_id = p.doc_b)
           |SELECT split, n_docs, n_groups, n_pairs, n_leaking
           |FROM sp, lk ORDER BY split""".stripMargin
      }
    ),

    // ----------------------------------------------------------- H3''c
    QueryDef(
      "q_dedup_containment",
      s"ASYMMETRIC containment detection (Broder's containment, not " +
        "resemblance): |A∩B| / min(|A|,|B|) over word-3-gram sets " +
        "finds subset relations — quotes, partial copies, a doc " +
        "embedded in a larger one — that symmetric Jaccard " +
        "structurally misses (a small doc fully contained in a 10x " +
        s"larger one has containment 1.0 but Jaccard ~0.1). " +
        "Candidates come from a DOCUMENT-FREQUENCY-CAPPED inverted " +
        s"n-gram index: only n-grams appearing in <= $ContainDfCap " +
        "docs generate pairs, so each posting list is bounded and the " +
        "candidate join is equi-keyed with per-key fan-out <= " +
        s"$ContainDfCap² — no all-pairs anywhere, at any corpus " +
        "size. Recall < 1 by design (a pair sharing ONLY stop-phrase " +
        "n-grams is invisible — those n-grams carry no copy evidence); " +
        "verification is exact set intersection on the candidate " +
        s"pair. Emits pairs with containment >= $ContainTau plus " +
        "their Jaccard, making the asymmetry visible.",
      (s, dir) => {
        val g = containGramsPersisted(s, dir)
        // r18 (§3.3): the df-capped posting relation r below is read
        // three times (the support counts and both self-join legs) and
        // the inverted explode twice (df + r) — persist r so the
        // explode + df filter run once per execution (posting rows are
        // df-capped, ≤ ContainDfCap per n-gram).
        val inv = g.select(col("doc_id"), size(col("ng")).as("na"),
          explode(col("ng")).as("g1"))
        // df-cap: n-grams are distinct per doc (wordNgrams dedups), so
        // count(*) per n-gram IS document frequency.
        val rare = inv.groupBy("g1").agg(count(lit(1)).as("df"))
          .filter(col("df") <= ContainDfCap)
          .select("g1")
        val r = SharedCaches.track(SharedCaches.ContainGrams,
          inv.join(rare, "g1")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        // Support prefilter (SOUND — the emitted set is unchanged, so
        // the oracle keeps the simple >=1-shared-rare form): a pair
        // with containment >= tau shares >= ceil(tau*min(na,nb))
        // n-grams total, of which at most min(oc_a, oc_b) can be
        // over-cap (a shared over-cap n-gram is over-cap in BOTH
        // sets), so its shared-RARE count — the pair-agg support —
        // is >= ceil(tau*min) - min(oc_a, oc_b), floored at the
        // original >=1-candidate requirement. All integer arithmetic
        // (tau = 4/5: ceil(4x/5) = (4x+4) div 5). Without this, a
        // low-entropy corpus whose n-grams are all under the df cap
        // candidates ~n_docs² pairs into the exact verify (measured
        // sf0.1: 1.04M pairs -> the true handful).
        val rcnt = r.groupBy("doc_id").agg(count(lit(1)).as("rc"))
        val oc = g.select(col("doc_id"), size(col("ng")).as("nax"))
          .join(rcnt, "doc_id")
          .select(col("doc_id"), (col("nax") - col("rc")).as("oc"))
        val pairs = r
          .select(col("g1"), col("doc_id").as("doc_a"), col("na").as("naa"))
          .join(r.select(col("g1"), col("doc_id").as("doc_b"),
            col("na").as("nab")), "g1")
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b", "naa", "nab")
          .agg(count(lit(1)).as("support"))
        val cand = pairs
          .join(broadcast(oc.select(col("doc_id").as("doc_a"),
            col("oc").as("oca"))), "doc_a")
          .join(broadcast(oc.select(col("doc_id").as("doc_b"),
            col("oc").as("ocb"))), "doc_b")
          .filter(col("support") >= greatest(lit(1),
            expr(containSupportBound("least(naa, nab)")) -
              least(col("oca"), col("ocb"))))
          .select("doc_a", "doc_b")
        val ga = g.select(col("doc_id").as("doc_a"), col("ng").as("nga"),
          size(col("ng")).as("na"))
        val gb = g.select(col("doc_id").as("doc_b"), col("ng").as("ngb"),
          size(col("ng")).as("nb"))
        cand.join(ga, "doc_a").join(gb, "doc_b")
          .withColumn("inter", size(array_intersect(col("nga"), col("ngb"))))
          .withColumn("cont",
            col("inter").cast("double") / least(col("na"), col("nb")))
          .filter(col("cont") >= ContainTau)
          .select(col("doc_a"), col("doc_b"),
            round(col("cont"), 6).as("containment"),
            round(col("inter").cast("double") /
              (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split($normSql,' ') AS w FROM documents),
              |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
              |    i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS ng
              |  FROM t WHERE len(w) >= 3),
              |inv AS (SELECT doc_id, unnest(ng) AS g1 FROM g),
              |rare AS (SELECT g1 FROM inv GROUP BY g1
              |  HAVING count(*) <= $ContainDfCap),
              |r AS (SELECT i.doc_id, i.g1 FROM inv i JOIN rare USING (g1)),
              |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM r a JOIN r b ON a.g1 = b.g1 AND a.doc_id < b.doc_id),
              |p AS (SELECT c.doc_a, c.doc_b,
              |    len(list_intersect(ga.ng, gb.ng)) AS inter,
              |    len(ga.ng) AS na, len(gb.ng) AS nb
              |  FROM cand c JOIN g ga ON ga.doc_id = c.doc_a
              |  JOIN g gb ON gb.doc_id = c.doc_b)
              |SELECT doc_a, doc_b,
              |  round(CAST(inter AS DOUBLE)/least(na, nb), 6) AS containment,
              |  round(CAST(inter AS DOUBLE)/(na + nb - inter), 6) AS jaccard
              |FROM p WHERE CAST(inter AS DOUBLE)/least(na, nb) >= $ContainTau
              |ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // ---------------------------------------------------------- H3''cm
    QueryDef(
      "q_containment_recall",
      "Measured precision/recall of the df-capped containment CANDIDATE " +
        "rule against exact all-pairs containment ground truth on the " +
        s"fixed doc panel (id % $RecallMod == 0 or id < $RecallPrefix) " +
        "— the number that makes the df cap falsifiable (the H3m/" +
        "q_ann_recall pattern applied to the containment family): " +
        "recall counts true containment pairs (cont >= 4/5) the " +
        "shared-rare-n-gram rule surfaces, precision the fraction of " +
        "candidates that verify. Ground truth is a deliberate " +
        "exact-baseline cross join bounded to the panel; the candidate " +
        "side is the production rule (df over the FULL corpus) with " +
        "the panel filter pushed into both self-join legs.",
      (s, dir) => {
        def inPanel(c: org.apache.spark.sql.Column) =
          c % RecallMod === 0 || c < RecallPrefix
        val g = containGramsPersisted(s, dir)
        val inv = g.select(col("doc_id"), explode(col("ng")).as("g1"))
        val rare = inv.groupBy("g1").agg(count(lit(1)).as("df"))
          .filter(col("df") <= ContainDfCap)
          .select("g1")
        val r = inv.join(rare, "g1").filter(inPanel(col("doc_id")))
        val cand = r.select(col("g1"), col("doc_id").as("doc_a"))
          .join(r.select(col("g1"), col("doc_id").as("doc_b")), "g1")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b").distinct()
        val pg = g.filter(inPanel(col("doc_id")))
        val ga = pg.select(col("doc_id").as("doc_a"), col("ng").as("nga"))
        val gb = pg.select(col("doc_id").as("doc_b"), col("ng").as("ngb"))
        def contOf = size(array_intersect(col("nga"), col("ngb")))
          .cast("double") / least(size(col("nga")), size(col("ngb")))
        val candC = cand.join(ga, "doc_a").join(gb, "doc_b")
          .withColumn("cont", contOf)
        val truth = ga.join(broadcast(gb), col("doc_a") < col("doc_b"))
          .select(contOf.as("cont"))
          .filter(col("cont") >= ContainTau)
        val m1 = pg.agg(count(lit(1)).as("n_panel_docs"))
        val m2 = truth.agg(count(lit(1)).as("n_true_pairs"))
        val m3 = candC.agg(count(lit(1)).as("n_candidates"),
          sum(when(col("cont") >= ContainTau, 1).otherwise(0))
            .cast("long").as("n_hits"))
        // vacuous-truth convention as q_dedup_recall (mirrored oracle)
        m1.crossJoin(m2).crossJoin(m3)
          .select(col("n_panel_docs"), col("n_true_pairs"),
            col("n_candidates"), col("n_hits"),
            when(col("n_candidates") > 0,
              round(col("n_hits").cast("double") / col("n_candidates"), 6))
              .otherwise(1.0).as("precision"),
            when(col("n_true_pairs") > 0,
              round(col("n_hits").cast("double") / col("n_true_pairs"), 6))
              .otherwise(1.0).as("recall"))
      },
      Some {
        val cont = "CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) / " +
          "least(len(a.ng), len(b.ng))"
        s"""WITH t AS (SELECT doc_id, string_split($normSql,' ') AS w FROM documents),
           |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
           |    i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS ng
           |  FROM t WHERE len(w) >= 3),
           |inv AS (SELECT doc_id, unnest(ng) AS g1 FROM g),
           |rare AS (SELECT g1 FROM inv GROUP BY g1
           |  HAVING count(*) <= $ContainDfCap),
           |r AS (SELECT i.doc_id, i.g1 FROM inv i JOIN rare USING (g1)
           |  WHERE i.doc_id % $RecallMod = 0 OR i.doc_id < $RecallPrefix),
           |cd AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |  FROM r a JOIN r b ON a.g1 = b.g1 AND a.doc_id < b.doc_id),
           |pg AS (SELECT doc_id, ng FROM g
           |  WHERE doc_id % $RecallMod = 0 OR doc_id < $RecallPrefix),
           |cc AS (SELECT c.doc_a, c.doc_b, $cont AS cont
           |  FROM cd c JOIN pg a ON a.doc_id = c.doc_a
           |  JOIN pg b ON b.doc_id = c.doc_b),
           |tr AS (SELECT count(*) AS n_true_pairs
           |  FROM pg a JOIN pg b ON a.doc_id < b.doc_id
           |  WHERE $cont >= $ContainTau),
           |m AS (SELECT (SELECT count(*) FROM pg) AS n_panel_docs,
           |    (SELECT n_true_pairs FROM tr) AS n_true_pairs,
           |    (SELECT count(*) FROM cc) AS n_candidates,
           |    (SELECT count(*) FILTER (cont >= $ContainTau) FROM cc)
           |      AS n_hits)
           |SELECT n_panel_docs, n_true_pairs, n_candidates, n_hits,
           |  CASE WHEN n_candidates > 0
           |    THEN round(CAST(n_hits AS DOUBLE)/n_candidates, 6)
           |    ELSE 1.0 END AS precision,
           |  CASE WHEN n_true_pairs > 0
           |    THEN round(CAST(n_hits AS DOUBLE)/n_true_pairs, 6)
           |    ELSE 1.0 END AS recall
           |FROM m""".stripMargin
      }
    ),

    // ---------------------------------------------------------- H3''c+
    QueryDef(
      "q_containment_incremental",
      "Incremental-ingest containment: an arriving batch (doc_id % 10 " +
        "= 0) is checked for subset relations AGAINST the standing " +
        "corpus — is this new doc a quote/partial copy of something " +
        "already ingested? The standing side is the STORED ContainIndex " +
        "(sixth artifact family): g1-bucketed postings with the " +
        "document frequency PRECOMPUTED (the df-cap candidate " +
        "restriction is a pushed parquet predicate) and doc_id-bucketed " +
        "n-gram arrays with the over-cap count precomputed (the sound " +
        "support-prefilter bound reads a stored column). Index sides " +
        "scan-only; ONLY the arriving batch shuffles. Emits each new " +
        "doc's best standing match at containment >= 4/5 " +
        "(containment desc, match_id asc). One probe definition " +
        "(ContainIndex.probe) shared with the streaming ingest face.",
      (s, dir) => {
        val isNew = col("doc_id") % 10 === 0
        val (postings, docArrays) = ContainIndex.buildOrLoad(s,
          Tables.par(s, dir, "documents").filter(!isNew),
          ContainIndex.tag(dir, "cstanding"))
        val newG = SharedCaches.track(SharedCaches.ContainBatch,
          ngramDocs(Tables.par(s, dir, "documents").filter(isNew))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        ContainIndex.probe(newG, postings, docArrays)
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split($normSql,' ') AS w FROM documents),
              |g AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
              |    i -> w[i]||' '||w[i+1]||' '||w[i+2])) AS ng
              |  FROM t WHERE len(w) >= 3),
              |std AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 <> 0),
              |nw AS (SELECT doc_id, ng FROM g WHERE doc_id % 10 = 0),
              |inv AS (SELECT doc_id, unnest(ng) AS g1 FROM std),
              |dfs AS (SELECT g1 FROM inv GROUP BY g1
              |  HAVING count(*) <= $ContainDfCap),
              |ninv AS (SELECT doc_id, unnest(ng) AS g1 FROM nw),
              |cand AS (SELECT DISTINCT n.doc_id, i.doc_id AS match_id
              |  FROM ninv n JOIN dfs USING (g1) JOIN inv i USING (g1)),
              |p AS (SELECT c.doc_id, c.match_id,
              |    len(list_intersect(a.ng, b.ng)) AS inter,
              |    len(a.ng) AS na, len(b.ng) AS nb
              |  FROM cand c JOIN nw a ON a.doc_id = c.doc_id
              |  JOIN std b ON b.doc_id = c.match_id),
              |q AS (SELECT doc_id, match_id,
              |    CAST(inter AS DOUBLE)/least(na, nb) AS cont,
              |    CAST(inter AS DOUBLE)/(na + nb - inter) AS jac
              |  FROM p WHERE CAST(inter AS DOUBLE)/least(na, nb)
              |    >= $ContainTau),
              |best AS (SELECT doc_id, match_id, cont, jac,
              |    ROW_NUMBER() OVER (PARTITION BY doc_id
              |      ORDER BY cont DESC, match_id ASC) AS rn FROM q)
              |SELECT doc_id, match_id, round(cont, 6) AS containment,
              |  round(jac, 6) AS jaccard
              |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin)
    ),

    // ------------------------------------------------------------- H2'
    QueryDef(
      "q_dedup_embedding",
      s"Embedding-cosine near-dup via banded hyperplane LSH ($EmbBands " +
        s"bands x $EmbPlanesPerBand planes, OR-amplified): candidates = " +
        "same (band, bucket) equi-join, then exact-cosine verify. No " +
        "cartesian anywhere — recall < 1 by design and the oracle twin " +
        "embeds the identical plane literals.",
      (s, dir) => {
        val e = Tables.par(s, dir, "embeddings")
          .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
          .withColumn("nrm", l2Norm(col("v")))
        // One row per (vector, band); each leg of the bucket join carries
        // its vector so the verify needs no second corpus join. At 100 TB
        // that is a bands-fold fan-out of the vector column through one
        // shuffle — linear, vs the corpus-squared cross join it replaces.
        val banded = e.select(col("vec_id"), col("v"), col("nrm"),
          posexplode(array(embBandPlanes.map(ps =>
            hyperplaneBucket(col("v"), ps)): _*)).as(Seq("band", "bkt")))
        val a = banded.select(col("vec_id").as("vec_a"), col("v").as("va"),
          col("nrm").as("na"), col("band"), col("bkt"))
        val b = banded.select(col("vec_id").as("vec_b"), col("v").as("vb"),
          col("nrm").as("nb"), col("band"), col("bkt"))
        a.join(b, Seq("band", "bkt"))
          .filter(col("vec_a") < col("vec_b"))
          .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .filter(col("cos") >= CosineTau)
          .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
          .distinct()
          .orderBy("vec_a", "vec_b")
      },
      Some {
        val bandSelects = embBandPlanes.zipWithIndex.map { case (ps, i) =>
          val bkt = ps.map { p =>
            val lits = p.map(v => if (v > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            // NULL dot -> NULL bucket (row drops from the join), as Spark
            s"CASE WHEN list_dot_product(v, $lits::DOUBLE[]) >= 0.0 THEN '1' " +
              s"WHEN list_dot_product(v, $lits::DOUBLE[]) < 0.0 THEN '0' END"
          }.mkString("||")
          s"SELECT vec_id, v, nrm, $i AS band, $bkt AS bkt FROM n"
        }.mkString("\nUNION ALL ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm FROM e),
           |bands AS ($bandSelects)
           |SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |  round(list_dot_product(a.v,b.v)/(a.nrm*b.nrm),6) AS cosine
           |FROM bands a JOIN bands b ON a.band=b.band AND a.bkt=b.bkt
           |  AND a.vec_id < b.vec_id
           |WHERE list_dot_product(a.v,b.v)/(a.nrm*b.nrm) >= $CosineTau
           |ORDER BY vec_a, vec_b""".stripMargin
      }
    ),

    // ------------------------------------------------------------ H2'''
    QueryDef(
      "q_dedup_semantic",
      "SemDeDup-style semantic dedup (Abbas et al. 2023, 'SemDeDup: " +
        "Data-efficient learning at web-scale through semantic " +
        "deduplication'): cluster the embedding corpus with the " +
        "derived-IVF coarse quantizer (~sqrt(n) cells, the stored " +
        "index q_ann_ivf already builds), compare vectors EXACTLY only " +
        s"within their cell, consolidate pairs with cosine >= " +
        s"$CosineTau via star-contraction connected components, and " +
        "keep the min-id representative per semantic cluster. Differs " +
        "from q_dedup_embedding in blocking (the LEARNED quantizer vs " +
        "random hyperplanes — SemDeDup's defining choice) and in " +
        "emitting consolidated per-doc verdicts, not pairs. The " +
        "DECLARED derivation (r8, acting on the r7-measured miss " +
        s"rates): cells from TARGET cluster size $SemTargetCluster " +
        "(sum |cell|^2 ~ n x target stays LINEAR in n, vs sqrt(n) " +
        "cells' n^1.5) plus bounded 2-NEAREST-CELL soft assignment — " +
        "a boundary pair split between two home cells still meets in " +
        "a shared 2nd-nearest cell, so pairs compare where their soft " +
        "cell sets intersect (<= 4x the hard within-cell compares, " +
        "same bound). Cross-cell pairs sharing NO soft cell are still " +
        "missed by design — the residual trade stays MEASURED per " +
        "derivation by q_dedup_semantic_recall (hard sqrt-n 0.185, " +
        "hard target-8 0.241, soft-2 strictly above, sf0.1 tau=0.4).",
      (s, dir) => {
        val cells = SimilarityQueries.derivedCellsForTarget(
          Tables.par(s, dir, "embeddings").count(), SemTargetCluster)
        // The stored quantizer family q_ann_ivf uses (tag embeds the
        // cell count); bucketing on cell co-locates each cell's vectors
        // for the within-cell pass below. Soft rank-2 rows derive at
        // read time from the stored cells + centroids.
        val (a2, centn) = IvfIndex.buildOrLoad(s, dir, cells)
        // r18 (§3.3/§5): soft is BOTH legs of the within-cell self-join
        // — un-materialized, the n×cells soft-assignment scoring pass
        // (the query's dominant compute; cells ≈ n/target) ran twice
        // per execution. Persisted under the Embeddings family.
        val soft = SharedCaches.track(SharedCaches.Embeddings,
          SimilarityQueries.softAssign(a2, centn)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val l = soft.select(col("cell"), col("vec_id").as("vec_a"),
          col("v").as("va"), col("nrm").as("na"))
        val r = soft.select(col("cell"), col("vec_id").as("vec_b"),
          col("v").as("vb"), col("nrm").as("nb"))
        // distinct: a pair sharing BOTH soft cells matches twice
        val pairs = l.join(r, "cell")
          .filter(col("vec_a") < col("vec_b"))
          .filter(dot(col("va"), col("vb")) / (col("na") * col("nb"))
            >= CosineTau)
          .select(col("vec_a").as("src"), col("vec_b").as("dst"))
          .distinct()
        val cc = clusterComponents(pairs)
          .select(col("id").as("vec_id"), col("component").as("keeper"))
        // `cell` of record stays the stored rank-1 assignment
        a2.select(col("vec_id"), col("cell"))
          .join(cc, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cell"),
            coalesce(col("keeper"), col("vec_id")).as("keeper_id"))
          .withColumn("is_dup",
            when(col("keeper_id") =!= col("vec_id"), 1).otherwise(0))
          .orderBy("vec_id")
      },
      Some(s"""WITH RECURSIVE ${SimilarityQueries.baseCte},
              |${SimilarityQueries.ivfAssignCtes("",
                  SimilarityQueries.targetCellsSql(SemTargetCluster))},
              |${SimilarityQueries.ivfSoftCte("")},
              |p AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
              |  FROM soft a JOIN soft b ON a.cell = b.cell AND a.vec_id < b.vec_id
              |  WHERE list_dot_product(a.v,b.v)/(a.nrm*b.nrm) >= $CosineTau),
              |sedges AS (SELECT src, dst FROM p
              |  UNION ALL SELECT dst, src FROM p),
              |swalk(id, reach) AS (
              |  SELECT DISTINCT src, src FROM sedges
              |  UNION
              |  SELECT w.id, e.dst FROM swalk w JOIN sedges e ON e.src = w.reach),
              |scc AS (SELECT id, min(reach) AS keeper FROM swalk GROUP BY id)
              |SELECT a2.vec_id, a2.cell,
              |  coalesce(scc.keeper, a2.vec_id) AS keeper_id,
              |  CASE WHEN coalesce(scc.keeper, a2.vec_id) <> a2.vec_id
              |    THEN 1 ELSE 0 END AS is_dup
              |FROM a2 LEFT JOIN scc ON scc.id = a2.vec_id
              |ORDER BY vec_id""".stripMargin)
    ),

    // --------------------------------------------------------- H2'''m
    QueryDef(
      "q_dedup_semantic_recall",
      "Measured cross-cell miss rate of SemDeDup's within-cell-only " +
        "compare — the q_dedup_recall pattern applied to the one " +
        "approximate op whose defining trade was still asserted, not " +
        "measured: exact all-pairs cosine >= tau ground truth on a " +
        s"bounded vector panel (id % $EmbPanelMod == 0 or id < " +
        s"$EmbPanelPrefix), against the pairs the cell blocking CAN " +
        "surface (within-cell verification is exact cosine at the same " +
        "tau, so a true pair is found iff both ends share a cell — the " +
        "miss set IS the cross-cell truth). One row per cell " +
        "derivation: the ~sqrt(n) cells (q_dedup_semantic's pre-r8 " +
        "derivation), the hard target-cluster-size alternative " +
        s"(target $SemTargetCluster here; thousands at 100 TB) whose " +
        "within-cell cost stays linear in n, and the DECLARED soft-2 " +
        "derivation q_dedup_semantic now runs at — target cells with " +
        "2-nearest-cell soft assignment, where a true pair is found " +
        "iff its soft cell sets intersect. All read the STORED " +
        "IvfIndex cell assignment. Round 9 adds the PUBLISHED operating " +
        s"point (tau=$HighTau; Abbas et al. run SemDeDup near 0.99): the " +
        "corpora carry no natural pairs above cosine ~0.51, so the p95_* " +
        "rows measure blocking recall on PLANTED near-identical twins — " +
        "each panel vector blended with its circular shift at alpha=0.2 " +
        "(pair cosine >= 0.97 by construction, verified by the tau " +
        "filter, never assumed) — per derivation: twin assigned by the " +
        "same centroid argmax, found iff it lands in the original's " +
        "(soft) cell set. The tau column separates the two regimes.",
      (s, dir) => {
        def inPanel(c: org.apache.spark.sql.Column) =
          c % EmbPanelMod === 0 || c < EmbPanelPrefix
        def variantRow(variant: String, cells: Int): DataFrame = {
          val (a2, _) = IvfIndex.buildOrLoad(s, dir, cells)
          val panel = a2.filter(inPanel(col("vec_id")))
          val l = panel.select(col("vec_id").as("vec_a"), col("v").as("va"),
            col("nrm").as("na"), col("cell").as("cell_a"))
          val r = panel.select(col("vec_id").as("vec_b"), col("v").as("vb"),
            col("nrm").as("nb"), col("cell").as("cell_b"))
          // Deliberate panel-bounded exact baseline (broadcast nested
          // loop on the panel only), same as q_dedup_recall's truth leg.
          val truth = l.join(broadcast(r), col("vec_a") < col("vec_b"))
            .filter(dot(col("va"), col("vb")) / (col("na") * col("nb"))
              >= CosineTau)
            .select(when(col("cell_a") === col("cell_b"), 1L)
              .otherwise(0L).as("sc"))
          val m1 = panel.agg(count(lit(1)).as("n_panel_vecs"))
          val m2 = truth.agg(count(lit(1)).as("n_true_pairs"),
            coalesce(sum(col("sc")), lit(0L)).as("n_found_pairs"),
            coalesce(sum(lit(1L) - col("sc")), lit(0L))
              .as("n_missed_cross_cell"))
          m1.crossJoin(m2).select(
            lit(variant).as("variant"), lit(CosineTau).as("tau"),
            lit(cells.toLong).as("n_cells"),
            col("n_panel_vecs"), col("n_true_pairs"), col("n_found_pairs"),
            col("n_missed_cross_cell"),
            // vacuous-truth guard, same convention as q_dedup_recall
            when(col("n_true_pairs") > 0,
              round(col("n_found_pairs") / col("n_true_pairs"), 6))
              .otherwise(1.0).as("recall"))
        }
        // The declared derivation's variant: found iff the two soft
        // cell sets intersect (rank-1 == the stored hard cell, so this
        // strictly dominates the hard variant at the same cell count).
        def softVariantRow(variant: String, cells: Int): DataFrame = {
          val (a2, centn) = IvfIndex.buildOrLoad(s, dir, cells)
          val panel = a2.filter(inPanel(col("vec_id")))
          // soft cells depend only on the vector + centroids, so the
          // panel-bounded truth leg scores only panel rows
          val cellSets = SimilarityQueries.softAssign(panel, centn)
            .groupBy("vec_id")
            .agg(sort_array(collect_list(col("cell"))).as("cells"))
          val pl = panel.join(cellSets, "vec_id")
          val l = pl.select(col("vec_id").as("vec_a"), col("v").as("va"),
            col("nrm").as("na"), col("cells").as("cells_a"))
          val r = pl.select(col("vec_id").as("vec_b"), col("v").as("vb"),
            col("nrm").as("nb"), col("cells").as("cells_b"))
          val truth = l.join(broadcast(r), col("vec_a") < col("vec_b"))
            .filter(dot(col("va"), col("vb")) / (col("na") * col("nb"))
              >= CosineTau)
            .select(when(arrays_overlap(col("cells_a"), col("cells_b")), 1L)
              .otherwise(0L).as("sc"))
          val m1 = panel.agg(count(lit(1)).as("n_panel_vecs"))
          val m2 = truth.agg(count(lit(1)).as("n_true_pairs"),
            coalesce(sum(col("sc")), lit(0L)).as("n_found_pairs"),
            coalesce(sum(lit(1L) - col("sc")), lit(0L))
              .as("n_missed_cross_cell"))
          m1.crossJoin(m2).select(
            lit(variant).as("variant"), lit(CosineTau).as("tau"),
            lit(cells.toLong).as("n_cells"),
            col("n_panel_vecs"), col("n_true_pairs"), col("n_found_pairs"),
            col("n_missed_cross_cell"),
            when(col("n_true_pairs") > 0,
              round(col("n_found_pairs") / col("n_true_pairs"), 6))
              .otherwise(1.0).as("recall"))
        }
        // Planted high-tau regime (published operating point): each panel
        // vector's deterministic near-identical twin — blend with the
        // circular shift at alpha=0.2, pair cosine >= 0.97 for any vector
        // — assigned by the SAME centroid argmax; found iff the twin's
        // rank<=k cell set meets the original's. k=1 uses the STORED
        // hard cell on the original side (no recompute), k=2 the soft
        // sets. Cost: one |panel| x centroid broadcast scoring pass.
        val twinSql =
          "transform(sequence(1, size(v)), i -> " +
            "(0.8*element_at(v, i) + " +
            "0.2*element_at(v, (i % size(v)) + 1)) / nrm)"
        def plantedRow(variant: String, cells: Int, k: Int): DataFrame = {
          val (a2, centn) = IvfIndex.buildOrLoad(s, dir, cells)
          val panel = a2.filter(inPanel(col("vec_id")))
          val pairs = panel
            .withColumn("tv", expr(twinSql))
            .withColumn("tnrm", sqrt(dot(col("tv"), col("tv"))))
            // verified >= HighTau, never assumed
            .filter(dot(col("v"), col("tv")) / (col("nrm") * col("tnrm"))
              >= HighTau)
          val origSets =
            if (k == 1) panel.select(col("vec_id"),
              array(col("cell")).as("ocells"))
            else SimilarityQueries.softAssign(panel, centn, k)
              .groupBy("vec_id")
              .agg(sort_array(collect_list(col("cell"))).as("ocells"))
          val twinSets = SimilarityQueries.softAssign(
              pairs.select(col("vec_id"), col("tv").as("v"),
                col("tnrm").as("nrm")), centn, k)
            .groupBy("vec_id")
            .agg(sort_array(collect_list(col("cell"))).as("tcells"))
          val scored = pairs.select("vec_id")
            .join(origSets, "vec_id").join(twinSets, "vec_id")
            .select(when(arrays_overlap(col("ocells"), col("tcells")), 1L)
              .otherwise(0L).as("sc"))
          val m1 = panel.agg(count(lit(1)).as("n_panel_vecs"))
          val m2 = scored.agg(count(lit(1)).as("n_true_pairs"),
            coalesce(sum(col("sc")), lit(0L)).as("n_found_pairs"),
            coalesce(sum(lit(1L) - col("sc")), lit(0L))
              .as("n_missed_cross_cell"))
          m1.crossJoin(m2).select(
            lit(variant).as("variant"), lit(HighTau).as("tau"),
            lit(cells.toLong).as("n_cells"),
            col("n_panel_vecs"), col("n_true_pairs"), col("n_found_pairs"),
            col("n_missed_cross_cell"),
            when(col("n_true_pairs") > 0,
              round(col("n_found_pairs") / col("n_true_pairs"), 6))
              .otherwise(1.0).as("recall"))
        }
        val n = Tables.par(s, dir, "embeddings").count()
        val targetCells =
          SimilarityQueries.derivedCellsForTarget(n, SemTargetCluster)
        variantRow("cells_sqrt_n", SimilarityQueries.derivedCells(n))
          .union(variantRow(s"cells_target$SemTargetCluster", targetCells))
          .union(softVariantRow(
            s"cells_target${SemTargetCluster}_soft2", targetCells))
          .union(plantedRow("p95_cells_sqrt_n",
            SimilarityQueries.derivedCells(n), 1))
          .union(plantedRow(s"p95_cells_target$SemTargetCluster",
            targetCells, 1))
          .union(plantedRow(s"p95_cells_target${SemTargetCluster}_soft2",
            targetCells, 2))
          .orderBy("variant")
      },
      Some {
        def variantSelect(p: String, variant: String, cellsSql: String,
                          tr: String = "tr", tau: Double = CosineTau) =
          s"""SELECT '$variant' AS variant, $tau AS tau,
             |  $cellsSql AS n_cells,
             |  (SELECT count(*) FROM ${p}panel) AS n_panel_vecs,
             |  (SELECT count(*) FROM ${p}$tr) AS n_true_pairs,
             |  (SELECT CAST(coalesce(sum(sc), 0) AS BIGINT) FROM ${p}$tr)
             |    AS n_found_pairs,
             |  (SELECT CAST(coalesce(sum(1 - sc), 0) AS BIGINT) FROM ${p}$tr)
             |    AS n_missed_cross_cell""".stripMargin
        def panelTruthCtes(p: String) =
          s"""${p}panel AS (SELECT * FROM ${p}a2
             |  WHERE vec_id % $EmbPanelMod = 0 OR vec_id < $EmbPanelPrefix),
             |${p}tr AS (SELECT CASE WHEN a.cell = b.cell THEN 1 ELSE 0 END AS sc
             |  FROM ${p}panel a JOIN ${p}panel b ON a.vec_id < b.vec_id
             |  WHERE list_dot_product(a.v,b.v)/(a.nrm*b.nrm) >= $CosineTau)"""
            .stripMargin
        // soft truth: found iff the two panel vectors' rank<=2 cell
        // sets intersect (the Spark side's arrays_overlap)
        val softCtes =
          s"""${SimilarityQueries.ivfSoftCte("t_", src = "t_panel")},
             |t_cellsets AS (SELECT vec_id, list(cell ORDER BY cell) AS cells
             |  FROM t_soft GROUP BY vec_id),
             |t_str AS (SELECT CASE WHEN len(list_intersect(ca.cells, cb.cells)) > 0
             |    THEN 1 ELSE 0 END AS sc
             |  FROM t_panel a JOIN t_panel b ON a.vec_id < b.vec_id
             |  JOIN t_cellsets ca ON ca.vec_id = a.vec_id
             |  JOIN t_cellsets cb ON cb.vec_id = b.vec_id
             |  WHERE list_dot_product(a.v,b.v)/(a.nrm*b.nrm) >= $CosineTau)"""
            .stripMargin
        // Planted high-tau twins (published operating point): the twin
        // of each panel vector, its rank<=2 centroid assignment, and the
        // hard (rank-1 vs stored cell) / soft (rank<=2 set intersect)
        // co-location verdicts. Twin arithmetic is written in the SAME
        // op order as the Spark transform lambda — identical doubles.
        def plantedCtes(p: String) =
          s"""${p}tpairs AS (SELECT vec_id, tv, tnrm FROM (
             |  SELECT w.vec_id, w.tv,
             |    sqrt(list_dot_product(w.tv, w.tv)) AS tnrm, q.v, q.nrm
             |  FROM (SELECT vec_id,
             |      list_transform(range(1, len(v)+1), i ->
             |        (0.8*v[i] + 0.2*v[(i % len(v)) + 1]) / nrm) AS tv
             |    FROM ${p}panel) w
             |  JOIN ${p}panel q ON q.vec_id = w.vec_id)
             |  WHERE list_dot_product(v, tv)/(nrm*tnrm) >= $HighTau),
             |${p}tassign AS (SELECT vec_id, cell, rn FROM (
             |  SELECT t.vec_id, c.cell,
             |    ROW_NUMBER() OVER (PARTITION BY t.vec_id
             |      ORDER BY list_dot_product(t.tv, c.cv)/(t.tnrm*c.cn) DESC,
             |      c.cell ASC) AS rn
             |  FROM ${p}tpairs t, ${p}centn c) WHERE rn <= 2),
             |${p}ptr AS (SELECT CASE WHEN a.cell = q.cell THEN 1 ELSE 0 END AS sc
             |  FROM ${p}tpairs t
             |  JOIN ${p}tassign a ON a.vec_id = t.vec_id AND a.rn = 1
             |  JOIN ${p}panel q ON q.vec_id = t.vec_id)""".stripMargin
        val plantedSoftCte =
          s"""t_pstr AS (SELECT CASE
             |    WHEN len(list_intersect(tc.cells, pc.cells)) > 0
             |    THEN 1 ELSE 0 END AS sc
             |  FROM t_tpairs t
             |  JOIN (SELECT vec_id, list(cell ORDER BY cell) AS cells
             |    FROM t_tassign GROUP BY vec_id) tc ON tc.vec_id = t.vec_id
             |  JOIN t_cellsets pc ON pc.vec_id = t.vec_id)""".stripMargin
        s"""WITH ${SimilarityQueries.baseCte},
           |${SimilarityQueries.ivfAssignCtes("", SimilarityQueries.sqrtCellsSql)},
           |${SimilarityQueries.ivfAssignCtes("t_",
              SimilarityQueries.targetCellsSql(SemTargetCluster))},
           |${panelTruthCtes("")},
           |${panelTruthCtes("t_")},
           |$softCtes,
           |${plantedCtes("")},
           |${plantedCtes("t_")},
           |$plantedSoftCte,
           |m AS (${variantSelect("", "cells_sqrt_n",
              SimilarityQueries.sqrtCellsSql)}
           |UNION ALL
           |${variantSelect("t_", s"cells_target$SemTargetCluster",
              SimilarityQueries.targetCellsSql(SemTargetCluster))}
           |UNION ALL
           |${variantSelect("t_", s"cells_target${SemTargetCluster}_soft2",
              SimilarityQueries.targetCellsSql(SemTargetCluster), tr = "str")}
           |UNION ALL
           |${variantSelect("", "p95_cells_sqrt_n",
              SimilarityQueries.sqrtCellsSql, tr = "ptr", tau = HighTau)}
           |UNION ALL
           |${variantSelect("t_", s"p95_cells_target$SemTargetCluster",
              SimilarityQueries.targetCellsSql(SemTargetCluster),
              tr = "ptr", tau = HighTau)}
           |UNION ALL
           |${variantSelect("t_", s"p95_cells_target${SemTargetCluster}_soft2",
              SimilarityQueries.targetCellsSql(SemTargetCluster),
              tr = "pstr", tau = HighTau)})
           |SELECT variant, tau, n_cells, n_panel_vecs, n_true_pairs,
           |  n_found_pairs, n_missed_cross_cell,
           |  CASE WHEN n_true_pairs > 0
           |    THEN round(CAST(n_found_pairs AS DOUBLE)/n_true_pairs, 6)
           |    ELSE 1.0 END AS recall
           |FROM m ORDER BY variant""".stripMargin
      }
    ),

    // ------------------------------------------------------------- H3++
    QueryDef(
      "q_dedup_incremental",
      "Incremental-ingest near-dup: an arriving batch (doc_id % 10 = 0, " +
        "a 10% slice) is deduped AGAINST the standing corpus instead of " +
        "all-pairs — new-batch MinHash bands equi-join the existing band " +
        "index, exact-Jaccard verify, keep each new doc's best match " +
        "(max j, min id tiebreak). The standing corpus's (band, hash) " +
        "index is a STORED artifact (BandIndex: bucketed on its key, " +
        "bucket sizes precomputed) — the index side is scan-only, the " +
        "hot-bucket cap is a pushed parquet predicate on the stored bsz " +
        "column, and ONLY the arriving batch shuffles. This is the " +
        "daily-ingest path — the whole-corpus q_doc_dedup pass never " +
        "reruns for a 0.1% batch.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val isNew = col("doc_id") % 10 === 0
        // The stored index covers the standing corpus only, so its
        // precomputed bsz counts standing docs — same population as the
        // oracle's QUALIFY over the non-new partition. Role "standing"
        // names THIS subset population exclusively; the pipeline/stream
        // whole-corpus artifact uses role "full" (buildOrLoad
        // short-circuits on tableExists, so a shared tag across the two
        // populations would silently poison whichever built second).
        val (idxSh, idxBands) = BandIndex.buildOrLoad(s,
          Tables.par(s, dir, "documents").filter(!isNew),
          BandIndex.tag(dir, "standing"))
        // boilerplate cap on the INDEX side only (a bucket with one
        // existing doc must still match new arrivals, so no lower bound);
        // bsz is a stored column -> pushed filter, no window, no Exchange
        // above the index scan (asserted by DedupOpsSpec).
        val exB = idxBands.filter(col("bsz") <= HotBucketCap)
          .select(col("doc_id").as("match_id"), col("band"), col("bh"))
        // Arriving batch: shingled fresh (it is the only data not yet in
        // the index), persisted — both the band probe and the verify leg
        // read it.
        val newSh = SharedCaches.track(SharedCaches.MinhashBatch,
          shingleRows(Tables.par(s, dir, "documents").filter(isNew))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val cand = bandsFromShingles(newSh)
          .join(exB, Seq("band", "bh"))
          .select("doc_id", "match_id").distinct()
        val a = newSh.select(col("doc_id"), col("sh").as("sha"))
        val b = idxSh.select(col("doc_id").as("match_id"), col("sh").as("shb"))
        val wBest = Window.partitionBy("doc_id")
          .orderBy(col("j").desc, col("match_id").asc)
        cand.join(a, "doc_id").join(b, "match_id")
          .select(col("doc_id"), col("match_id"),
            jaccard(col("sha"), col("shb")).as("j"))
          .filter(col("j") >= MinhashVerifyJ)
          .withColumn("rn", row_number().over(wBest))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("match_id"),
            round(col("j"), 6).as("jaccard"))
          .orderBy("doc_id")
      },
      Some {
        val j = "CAST(len(list_intersect(a.sh,e.sh)) AS DOUBLE) / " +
          "len(list_distinct(list_concat(a.sh,e.sh)))"
        s"""WITH $pairsSqlCtes,
           |exb AS (SELECT doc_id AS match_id, b, bh FROM bands0
           |  WHERE doc_id % 10 <> 0
           |  QUALIFY count(*) OVER (PARTITION BY b, bh) <= $HotBucketCap),
           |cand2 AS (SELECT DISTINCT n.doc_id, e2.match_id
           |  FROM (SELECT doc_id, b, bh FROM bands0 WHERE doc_id % 10 = 0) n
           |  JOIN exb e2 ON n.b = e2.b AND n.bh = e2.bh),
           |v AS (SELECT c.doc_id, c.match_id, $j AS j
           |  FROM cand2 c JOIN d a ON a.doc_id = c.doc_id
           |  JOIN d e ON e.doc_id = c.match_id),
           |best AS (SELECT doc_id, match_id, j,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id
           |      ORDER BY j DESC, match_id ASC) AS rn
           |  FROM v WHERE j >= $MinhashVerifyJ)
           |SELECT doc_id, match_id, round(j, 6) AS jaccard
           |FROM best WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }
    )
  )
}
