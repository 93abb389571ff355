package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data curation step
  * that follows dedup/quality filtering in an LLM pipeline: downsample
  * over-represented strata (language, source) to a target mix.
  *
  * Selector = first 2 hex chars of md5(doc_id): a uniform 256-level hash
  * that both engines compute identically, so the sample is reproducible
  * ANYWHERE (unlike rand()/TABLESAMPLE, whose streams are engine- and
  * partitioning-dependent). Scale: stateless per-row predicate — no
  * shuffle, no driver coordination; at 100 TB the per-stratum rate map
  * rides along as a broadcast literal (here a CASE expression).
  */
object SampleQueries {

  // per-language keep-rates as hex thresholds out of 256: en is
  // over-represented in the corpus -> 25%; everything else 50%.
  private val rates = Seq("en" -> "40") // 0x40/0x100 = 25%
  private val defaultRate = "80"        // 0x80/0x100 = 50%

  /** Shard count of the deterministic permutation — structural, not a
    * tuning knob: the shard IS the key's leading hex digit, so there
    * are exactly 16. Report strings derive from this constant so a
    * future wider-prefix variant cannot silently lie in the logs
    * (r12 advice).
    */
  private[graft] val NumShards = 16

  /** The deterministic training-order permutation (q_shuffle_shard's
    * body, factored out so the shard-major WRITER — Pipeline's artifact
    * phase via [[graft.etl.Layout.writeShardMajor]] — materializes the
    * exact relation the declared query proves correct): every column of
    * `docs` plus key = md5(doc_id), shard = leading key hex digit, pos =
    * rank within shard, gpos = global permutation position, assembled
    * without a global sort (16-way partitioned window + a 16-row
    * broadcast prefix sum over shard counts).
    */
  /** THE shard assignment (leading hex digit of a doc's md5 key) — one
    * definition for the training-order permutation, the train-ready
    * composition, and the mix audit (r14 review: three inline copies
    * meant the audit could silently keep measuring an OLD sharding if
    * the pack's function ever changed). [[NumShards]] == 16 is this
    * function's range by construction.
    */
  private[graft] def shardOfKey(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(key, 1, 1), 16, 10).cast("int")

  private[graft] def shardOf(docId: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    shardOfKey(md5(docId.cast("string")))

  /** STRATIFIED shard assignment — the mixture-fidelity REMEDY (r14
    * verdict #5, the q_split_leakage → q_split_cluster_aware
    * audit→remedy pattern applied to q_train_mix_audit's finding):
    * per-source round-robin on the survivor schedule rank, so each
    * source's kept docs land ⌊n_g/16⌋-or-⌈n_g/16⌉ per shard BY
    * CONSTRUCTION — the worst per-(shard, source) deviation is ≤ 1 doc
    * where the hash rule's is a measured binomial wobble (brutal for
    * small sources). Still deterministic (the rank is the md5-ordered
    * schedule rank) and still source-independent within a shard (ranks
    * interleave sources exactly as the schedule does). The trade the
    * audit prices: hash sharding keeps a doc's shard stable under
    * corpus growth (append-only pipelines re-shard nothing); the
    * stratified rule re-ranks — appending docs to a source can move
    * every later rank's shard, so it fits frozen-snapshot training
    * runs, not incrementally-maintained ones.
    */
  private[graft] def stratifiedShardOf(srcRank: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    ((srcRank - lit(1)) % lit(NumShards)).cast("int")

  private[graft] def shuffleShardPerm(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs
      .withColumn("key", md5(col("doc_id").cast("string")))
      .withColumn("shard", shardOfKey(col("key")))
    val pos = d.withColumn("pos",
      row_number().over(
        Window.partitionBy("shard").orderBy(col("key"), col("doc_id")))
        .cast("long"))
    // 16-row offset relation: the only cross-shard coordination is this
    // prefix sum over shard COUNTS — constant-size at any corpus scale,
    // then broadcast back.
    val offsets = pos.groupBy("shard")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        coalesce(sum(col("cnt")).over(
          Window.orderBy("shard")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    pos.join(broadcast(offsets), "shard")
      .withColumn("gpos", col("off") + col("pos"))
      .drop("off")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_stratified_sample",
      "Deterministic stratified sample: keep a doc iff the first hex " +
        "byte of md5(doc_id) clears the per-language threshold (en 25%, " +
        "others 50%). Reproducible across engines and cluster layouts.",
      (s, dir) => {
        val thresh = rates.foldLeft(when(lit(false), lit(""))) {
          case (acc, (lang, hex)) => acc.when(col("lang") === lang, lit(hex))
        }.otherwise(lit(defaultRate))
        Tables.t(s, dir, "documents")
          .withColumn("sel", substring(md5(col("doc_id").cast("string")), 1, 2))
          .filter(col("sel") < thresh)
          .select(col("doc_id"), col("lang"), col("source"), col("sel"))
          .orderBy("doc_id")
      },
      Some {
        val cases = rates.map { case (l, h) => s"WHEN lang = '$l' THEN '$h'" }
          .mkString(" ")
        s"""SELECT doc_id, lang, source,
           |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sel
           |FROM documents
           |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
           |  (CASE $cases ELSE '$defaultRate' END)
           |ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q_stratified_exact_k",
      "Exact-k stratified sample: exactly min(5, |stratum|) docs per " +
        "(lang, source) stratum, selected by md5(doc_id) rank — the " +
        "balanced eval-set construction a rate-based sample cannot " +
        "give (rates yield binomial counts; quotas need a rank). " +
        "Deterministic: the hash order is engine- and layout-" +
        "independent, ties impossible (doc_id is unique inside its " +
        "md5). One stratum-keyed window shuffle; WindowGroupLimit " +
        "prunes to k rows per stratum BEFORE the exchange, so the " +
        "shuffle carries ~k x strata rows however large the corpus.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val k = 5
        val w = Window.partitionBy("lang", "source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        Tables.t(s, dir, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k)
          .select(col("doc_id"), col("lang"), col("source"), col("rk"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, rk FROM (
             |  SELECT doc_id, lang, source,
             |    ROW_NUMBER() OVER (PARTITION BY lang, source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5 ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_stratified_mink",
      "The SAME exact-k stratified sample as q_stratified_exact_k, " +
        "computed as a deterministic hash-ordered RESERVOIR: a " +
        "mergeable bounded min-k Catalyst aggregate " +
        "(functions/MinKAgg) keeps each stratum's k smallest " +
        "md5(doc_id)-prefixed keys in an O(k) heap per task buffer. " +
        "min-k is exactly distributive, so the result is identical at " +
        "any partitioning — no window, no per-stratum sort of the " +
        "full input; map-side partials collapse every task to <= k " +
        "entries BEFORE the stratum shuffle (~k x strata rows on the " +
        "wire however large the corpus). The at-scale alternative the " +
        "window formulation is measured against; same oracle.",
      (s, dir) => {
        val k = 5
        val key = concat(md5(col("doc_id").cast("string")), lit("|"),
          col("doc_id").cast("string"))
        Tables.t(s, dir, "documents")
          .groupBy("lang", "source")
          .agg(graft.functions.MinKAgg.minK(key, k).as("ks"))
          .select(col("lang"), col("source"),
            posexplode(col("ks")).as(Seq("i", "key")))
          .select(
            split(col("key"), "\\|").getItem(1).cast("long").as("doc_id"),
            col("lang"), col("source"), (col("i") + 1).as("rk"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, source, rk FROM (
             |  SELECT doc_id, lang, source,
             |    ROW_NUMBER() OVER (PARTITION BY lang, source
             |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= 5 ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_data_split",
      "Deterministic train/val/test split (90/5/5): bucket = the first " +
        "24 md5 bits of doc_id mod 100 — stable under re-partitioning, " +
        "re-runs, and engine choice (rand()-based splits are none of " +
        "those). Stateless per-row label + one agg; a doc's split never " +
        "changes as the corpus grows, so incremental ingest cannot leak " +
        "train docs into held-out sets.",
      (s, dir) => {
        val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long") % 100
        Tables.t(s, dir, "documents")
          .withColumn("split",
            when(bkt < 90, "train").when(bkt < 95, "val").otherwise("test"))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"))
          .orderBy("split")
      },
      Some("""WITH b AS (SELECT doc_id, source,
             |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bkt
             |  FROM documents)
             |SELECT CASE WHEN bkt < 90 THEN 'train'
             |            WHEN bkt < 95 THEN 'val' ELSE 'test' END AS split,
             |  count(*) AS n_docs, count(DISTINCT source) AS n_sources,
             |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)
    ),

    QueryDef(
      "q_importance_sample",
      "Quality-proportional importance sampling: each doc is kept with " +
        "probability quality_points/3 (the 0-3 gate as a sampling " +
        "weight) — the weighted mix-building step that up-samples " +
        "high-quality text instead of hard-filtering (a soft version " +
        "of the corpus-filter gate). Deterministic and EXACT in " +
        "integers: the 24-bit md5 hash of doc_id is kept iff " +
        "3*hash < qp*2^24 — no float acceptance threshold, so the " +
        "same doc is kept on every engine, layout, and rerun, and " +
        "incremental ingest cannot flip earlier decisions. Output is " +
        "the measured sampler: per quality level, docs seen/kept and " +
        "actual vs target rate. Stateless per-row decision + one tiny " +
        "agg — map-only at any scale.",
      (s, dir) => {
        val toks = graft.functions.TextFunctions.tokens(col("text"))
        val qp = graft.ops.TextQueries.qualityPoints(
          length(col("text")), size(toks),
          graft.ops.TextQueries.nStop(toks))
        val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long")
        Tables.t(s, dir, "documents")
          .withColumn("qp", qp)
          .withColumn("kept",
            when(bkt * 3 < col("qp").cast("long") * (1L << 24), 1L)
              .otherwise(0L))
          .groupBy("qp")
          .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
            round(sum(col("kept")).cast("double") / count(lit(1)), 6)
              .as("actual_rate"),
            round(col("qp").cast("double") / 3, 6).as("target_rate"))
          .orderBy("qp")
      },
      Some {
        val stop = graft.ops.TextQueries.stopwords.map(x => s"'$x'")
          .mkString("[", ",", "]")
        s"""WITH t AS (SELECT doc_id, ${graft.functions.TextFunctions.toksSql} AS toks,
           |    length(text) AS n_chars,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) AS bkt
           |  FROM documents),
           |m AS (SELECT doc_id, bkt,
           |    (CASE WHEN len(toks) >= 10 THEN 1 ELSE 0 END
           |     + CASE WHEN len(list_filter(toks, x -> list_contains($stop, x))) > 0
           |       THEN 1 ELSE 0 END
           |     + CASE WHEN n_chars >= 64 THEN 1 ELSE 0 END) AS qp
           |  FROM t)
           |SELECT qp, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN 3*bkt < qp*16777216 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  round(CAST(sum(CASE WHEN 3*bkt < qp*16777216 THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
           |    / count(*), 6) AS actual_rate,
           |  round(qp::DOUBLE / 3, 6) AS target_rate
           |FROM m GROUP BY qp ORDER BY qp""".stripMargin
      }
    ),

    QueryDef(
      "q_split_divergence",
      "Split-distribution parity audit: Laplace-smoothed unigram KL " +
        "divergence (in bits) of each held-out split against train, " +
        "plus the held-out token mass on words train never saw — the " +
        "'is my eval set representative' check a release runs before " +
        "trusting val/test numbers (a drifted split measures the " +
        "wrong distribution). Smoothing is over the shared corpus " +
        "vocabulary, so KL is finite by construction. Cross-engine " +
        "float determinism is the LM-scorer's convention: each " +
        "per-word KL term is rounded to 9 decimals BEFORE the exact " +
        "DECIMAL summation (a last-ulp libm ln difference cannot " +
        "reach the sum), ln2 one shared double literal. Scale shape: " +
        "one token-grain agg to (split x word) counts — vocab-grain " +
        "from there (the term grid is vocab x 2 rows, counts " +
        "broadcast), nothing corpus-scale after the first agg.",
      (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val ln2 = graft.ops.CorpusQueries.Ln2
        val bkt = conv(substring(md5(col("doc_id").cast("string")), 1, 6),
          16, 10).cast("long") % 100
        val d = Tables.par(s, dir, "documents")
          .withColumn("split",
            when(bkt < 90, "train").when(bkt < 95, "val").otherwise("test"))
          .select(col("split"),
            explode(graft.functions.TextFunctions.tokens(col("text")))
              .as("w"))
          .filter(col("w") =!= "")
        // r18 (§3.3): cnt is read five times downstream (vocab, the
        // train slice + its total, the split slices + totals, and the
        // grid joins) — un-materialized, each reference re-ran the
        // corpus explode + count. Vocab-grain (split × word) at any
        // corpus scale; eager localCheckpoint truncates all five.
        val cnt = org.apache.spark.sql.GraftSqlBridge.freshLocalCheckpoint(
          d.groupBy("split", "w").agg(count(lit(1)).as("c")))
        val vocab = cnt.select("w").distinct()
        val vrow = vocab.agg(count(lit(1)).as("vsz"))
        val tr = cnt.filter(col("split") === "train")
          .select(col("w"), col("c").as("ct"))
        val ntr = tr.agg(sum(col("ct")).as("nt"))
        val sp = cnt.filter(col("split") =!= "train")
        val nsp = sp.groupBy("split").agg(sum(col("c")).as("ns"))
        val grid = vocab.crossJoin(broadcast(nsp.select("split")))
          .join(sp.select(col("split"), col("w"), col("c").as("cs")),
            Seq("split", "w"), "left")
          .join(tr, Seq("w"), "left")
          .select(col("split"), col("w"),
            coalesce(col("cs"), lit(0L)).as("cs"),
            coalesce(col("ct"), lit(0L)).as("ct"))
          .join(broadcast(nsp), "split")
          .crossJoin(broadcast(ntr)).crossJoin(broadcast(vrow))
          .withColumn("p",
            (col("cs") + 1).cast("double") / (col("ns") + col("vsz")))
          .withColumn("q",
            (col("ct") + 1).cast("double") / (col("nt") + col("vsz")))
          .withColumn("bits",
            round(col("p") * (log(col("p")) - log(col("q"))) / lit(ln2), 9))
        grid.groupBy("split")
          .agg(sum(col("bits").cast(DecimalType(38, 10))).cast("double")
            .as("klraw"),
            sum(when(col("ct") === 0, col("cs")).otherwise(0L)).as("oovc"))
          .join(broadcast(nsp), "split")
          .crossJoin(broadcast(vrow))
          .select(col("split"), col("ns").as("n_tokens"),
            col("vsz").as("vocab_size"),
            round(col("oovc").cast("double") / col("ns"), 6).as("oov_mass"),
            round(col("klraw"), 6).as("kl_bits"))
          .orderBy("split")
      },
      Some {
        val ln2 = graft.ops.CorpusQueries.Ln2
        s"""WITH d AS (SELECT
           |    CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
           |         ELSE 'test' END AS split, w FROM (
           |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
           |      AS BIGINT) % 100 AS b,
           |    unnest(${graft.functions.TextFunctions.toksSql}) AS w
           |  FROM documents) WHERE w <> ''),
           |cnt AS (SELECT split, w, CAST(count(*) AS BIGINT) AS c
           |  FROM d GROUP BY split, w),
           |vocab AS (SELECT DISTINCT w FROM cnt),
           |vrow AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM vocab),
           |tr AS (SELECT w, c AS ct FROM cnt WHERE split = 'train'),
           |ntr AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tr),
           |nsp AS (SELECT split, CAST(sum(c) AS BIGINT) AS ns FROM cnt
           |  WHERE split <> 'train' GROUP BY split),
           |grid AS (SELECT g.split, g.w,
           |    coalesce(sc.c, 0) AS cs, coalesce(tr.ct, 0) AS ct,
           |    g.ns, ntr.nt, vrow.vsz
           |  FROM (SELECT v.w, s.split, s.ns FROM vocab v, nsp s) g
           |  LEFT JOIN cnt sc ON sc.split = g.split AND sc.w = g.w
           |  LEFT JOIN tr ON tr.w = g.w, ntr, vrow),
           |terms AS (SELECT split, cs, ct,
           |    round(((cs + 1)::DOUBLE / (ns + vsz)) *
           |      (ln((cs + 1)::DOUBLE / (ns + vsz)) -
           |       ln((ct + 1)::DOUBLE / (nt + vsz))) / $ln2, 9) AS bits,
           |    ns, vsz
           |  FROM grid)
           |SELECT split, ns AS n_tokens, vsz AS vocab_size,
           |  round(CAST(sum(CASE WHEN ct = 0 THEN cs ELSE 0 END) AS DOUBLE)
           |    / ns, 6) AS oov_mass,
           |  round(CAST(sum(CAST(bits AS DECIMAL(38,10))) AS DOUBLE), 6)
           |    AS kl_bits
           |FROM terms GROUP BY split, ns, vsz ORDER BY split""".stripMargin
      }
    ),

    QueryDef(
      "q_shuffle_shard",
      "Deterministic global training-order shuffle + sharding: the " +
        "reproducible corpus permutation a training run reads (epoch " +
        "order must be engine-, layout-, and rerun-independent; " +
        "rand()/repartition orders are none of those). Position key = " +
        "md5(doc_id); shard = the key's leading hex digit, so shards " +
        "are RANGES of the key space and reading shards 0..15 " +
        "shard-major replays the exact global md5 permutation. The " +
        "global position is assembled WITHOUT a global sort: per-shard " +
        "rank (a 16-way partitioned window) + the shard's cumulative " +
        "offset (a 16-row broadcast). At 100 TB each shard is an " +
        "independent partition family written as its own file group — " +
        "the key is uniform by construction, so range boundaries need " +
        "no sampling pass and shard sizes are balanced to ~n/16. The " +
        "oracle computes the SAME permutation the naive way (one " +
        "global ROW_NUMBER), proving the sharded assembly exact.",
      (s, dir) =>
        shuffleShardPerm(Tables.t(s, dir, "documents"))
          .select(col("doc_id"), col("shard"), col("pos"), col("gpos"))
          .orderBy("gpos"),
      Some("""WITH k AS (SELECT doc_id,
             |    md5(CAST(doc_id AS VARCHAR)) AS key FROM documents)
             |SELECT doc_id,
             |  CAST(('0x' || substr(key, 1, 1)) AS INT) AS shard,
             |  ROW_NUMBER() OVER (
             |    PARTITION BY substr(key, 1, 1)
             |    ORDER BY key, doc_id) AS pos,
             |  ROW_NUMBER() OVER (ORDER BY key, doc_id) AS gpos
             |FROM k ORDER BY gpos""".stripMargin)
    ),

    QueryDef(
      "q_shard_balance",
      "Loader-balance audit of the H8s training shards — the straggler " +
        "report a run reads BEFORE committing to an epoch: per shard " +
        "(leading md5 hex digit, the SAME assignment as " +
        "shuffleShardPerm/writeShardMajor, re-derived here MAP-ONLY — " +
        "balance needs no ranks, so the window is dropped), doc and " +
        "token counts, the packed-sequence count at the H9p budget " +
        "((tok + L-1) div L, integer-exact — each shard packs " +
        "independently, so this IS the per-shard file row count of the " +
        "packed artifact), token share, and the global imbalance " +
        "factor max_tok * 16 / total_tok on every row (epoch " +
        "wall-clock is the max shard, so imbalance IS the straggler " +
        "multiplier vs a perfectly even split over the FIXED 16 " +
        "shards — empty shards count as imbalance, they don't slow " +
        "the epoch but they waste a file group; ~1.0 expected, md5 " +
        "is uniform by construction). " +
        "Shape: ONE corpus pass into a 16-group map-side agg + a " +
        "16-row broadcast total; no windows, no corpus-grain joins.",
      (s, dir) => {
        val l = PackingQueries.ArtifactBudget
        val per = Tables.t(s, dir, "documents")
          .select(
            conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10)
              .cast("int").as("shard"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("n_tok"))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).cast("long").as("n_tokens"))
          .withColumn("n_seqs", expr(s"(n_tokens + ${l - 1}) div $l"))
        val tot = per.agg(sum(col("n_tokens")).cast("long").as("tot_tok"),
          max(col("n_tokens")).as("max_tok"))
        per.crossJoin(broadcast(tot))
          .select(col("shard"), col("n_docs"), col("n_tokens"),
            col("n_seqs"),
            round(col("n_tokens").cast("double") / col("tot_tok"), 6)
              .as("tok_share"),
            round(col("max_tok").cast("double") * lit(16)
              / col("tot_tok"), 6).as("imbalance"))
          .orderBy("shard")
      },
      Some {
        val l = PackingQueries.ArtifactBudget
        s"""WITH t AS (SELECT
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
           |      AS INT) AS shard,
           |    CAST(len(${graft.functions.TextFunctions.toksSql}) AS BIGINT)
           |      AS n_tok
           |  FROM documents),
           |p AS (SELECT shard, COUNT(*) AS n_docs,
           |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
           |  FROM t GROUP BY shard),
           |p2 AS (SELECT *,
           |    CAST((n_tokens + ${l - 1}) // $l AS BIGINT) AS n_seqs FROM p),
           |g AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tok,
           |    CAST(MAX(n_tokens) AS BIGINT) AS max_tok FROM p2)
           |SELECT shard, n_docs, n_tokens, n_seqs,
           |  round(CAST(n_tokens AS DOUBLE) / tot_tok, 6) AS tok_share,
           |  round(CAST(max_tok AS DOUBLE) * 16 / tot_tok, 6)
           |    AS imbalance
           |FROM p2 CROSS JOIN g ORDER BY shard""".stripMargin
      }
    )
  )
}
