package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, the
  * subword-vocabulary construction every modern LM tokenizer descends
  * from) — SURVEY.md §2 H4+': learn the first
  * [[BpeQueries.NumMerges]] merges of a character-level BPE over the
  * corpus, emitting the merge table (rank, lhs, rhs, weighted pair
  * count) that a tokenizer would apply at encode time.
  *
  * Scale shape (100 TB): classic BPE is learned on the WORD-FREQUENCY
  * table, not the raw corpus — one corpus-scale tokenize+count pass,
  * then every merge round runs at VOCABULARY grain (distinct words ×
  * avg word length symbol rows; 10^6–10^8 rows for real corpora — MBs
  * to low GBs, trivially partitioned, while the corpus is 100 TB). The
  * driver loop is [[DedupQueries]]' star-contraction pattern: one
  * 1-row argmax fetch per round (the sanctioned scalar-fetch shape),
  * state persisted per round with the previous round released.
  *
  * Greedy NON-OVERLAPPING merge application (the subtle part — "aaaa"
  * under merge (a,a) must become (aa)(aa), not three overlapping
  * pairs) is done positionally and engine-portably: mark matching
  * positions, group CONSECUTIVE matches into runs (i − row_number over
  * matches), merge at odd run-offsets only — the exact left-to-right
  * greedy semantics, expressed in window functions both engines share
  * (no sequential UDF, no recursion). Determinism: integer counts,
  * lexicographic (lhs, rhs) tiebreak on the argmax, strings only —
  * nothing float-valued anywhere.
  *
  * Deviation from Sennrich: no end-of-word marker symbol (</w>); at
  * word grain the marker only distinguishes suffix merges from infix
  * ones, and dropping it keeps the oracle replay byte-identical with
  * no special-cased symbol. Documented, deliberate.
  */
object BpeQueries {

  /** Merge rounds learned. 10 keeps the unrolled oracle tractable;
    * production vocabularies run the same loop 30k–50k times at the
    * same per-round cost. Embedded in [[BpeStore.tag]] so a budget
    * change rebuilds the stored artifact.
    */
  private[ops] val NumMerges = 10

  /** (word, cnt, syms) initial state over an arbitrary documents
    * relation: normalized-token frequencies, each word split into
    * single-character symbols. The explicit substring formulation (not
    * split-on-empty) is mirrored verbatim by the oracle. Shared by the
    * learn path, [[BpeStore]]'s build, and the append face's
    * batch-vocabulary derivation.
    */
  private[ops] def vocabOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextFunctions.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  private def vocab0(s: SparkSession, dir: String): DataFrame =
    vocabOf(Tables.par(s, dir, "documents"))

  /** Symbol-position explosion of a vocabulary state — the shared
    * prefix of the argmax scan and the merge application.
    */
  private def explodeSyms(v: DataFrame): DataFrame =
    v.select(col("word"), col("cnt"), col("syms"),
        posexplode(col("syms")).as(Seq("i0", "s")))
      .withColumn("i", (col("i0") + 1).cast("int"))

  /** Apply ONE merge (l, r) to an exploded vocabulary state, greedy
    * non-overlapping: mark matching positions, group CONSECUTIVE
    * matches into runs, merge at odd run-offsets only (position i+1
    * after a merge is consumed) — left-to-right greedy semantics in
    * window functions both engines share. ONE definition for the learn
    * loop and [[applyMerges]] (the encode-against-standing-merges path)
    * — the two replays cannot drift.
    */
  private def applyMerge(e: DataFrame, l: String, r: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = e.withColumn("mt",
      (col("i") < size(col("syms"))) && col("s") === lit(l) &&
        (element_at(col("syms"), col("i") + 1) === lit(r)))
    val wRun = Window.partitionBy("word").orderBy("i")
    val runs = m.filter(col("mt"))
      .withColumn("grp", col("i") - row_number().over(wRun))
    val mergeAt = runs
      .withColumn("rn", row_number().over(
        Window.partitionBy("word", "grp").orderBy("i")))
      .filter(col("rn") % 2 === 1)
      .select(col("word"), col("i").as("mi"))
    val maA = mergeAt.select(col("word").as("aw"), col("mi").as("ai"))
    val maP = mergeAt.select(col("word").as("pw"), col("mi").as("pi"))
    m
      .join(maA, col("word") === col("aw") && col("i") === col("ai"), "left")
      .join(maP, col("word") === col("pw") && col("i") === col("pi") + 1,
        "left")
      .filter(col("pi").isNull) // consumed by the merge starting at i-1
      .withColumn("ns",
        when(col("ai").isNotNull, lit(l + r)).otherwise(col("s")))
      .groupBy("word", "cnt")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("ns")))),
        x => x.getField("ns")).as("syms"))
  }

  /** One merge round: (best pair via 1-row fetch, next vocab state) —
    * None when no adjacent pair remains (every word fully merged; the
    * oracle's empty-b{r} stage contributes no output row either, so
    * stopping here keeps the two sides identical).
    */
  private def mergeRound(v: DataFrame)
      : Option[((String, String, Long), DataFrame)] = {
    val e = explodeSyms(v)
    val bestRows = e.filter(col("i") < size(col("syms")))
      .select(col("s").as("lhs"),
        element_at(col("syms"), col("i") + 1).as("rhs"), col("cnt"))
      .groupBy("lhs", "rhs").agg(sum(col("cnt")).as("total"))
      .orderBy(col("total").desc, col("lhs").asc, col("rhs").asc)
      .limit(1).collect()
    if (bestRows.isEmpty) return None
    val best = bestRows(0)
    val (l, r, tot) = (best.getString(0), best.getString(1), best.getLong(2))
    Some(((l, r, tot), applyMerge(e, l, r)))
  }

  /** ENCODE an arbitrary vocabulary state against an already-learned
    * merge list, in rank order — the tokenizer's apply pass for words
    * the learn loop never saw ([[BpeStore.append]]'s body and the
    * differential-spec reference). No argmax anywhere: the merges are
    * given, so each round is one window-parity application at the
    * batch's vocabulary grain. Same per-round checkpoint discipline as
    * [[learnAndApply]] (each round's state replaces the previous; the
    * superseded round's blocks are freed immediately).
    */
  private[ops] def applyMerges(v0: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var v = v0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ok = false
    try {
      for ((l, r) <- merges) {
        val nv = GraftSqlBridge.freshLocalCheckpoint(applyMerge(explodeSyms(v), l, r))
        v.unpersist()
        Checkpoints.free(v)
        v = nv
      }
      ok = true
    } finally if (!ok) { v.unpersist(); Checkpoints.free(v) }
    v
  }

  /** Run the merge loop to `numMerges` rounds, returning the learned
    * table and the FINAL vocabulary state (word, cnt, syms) with every
    * merge applied — the state a tokenizer's encode pass reproduces.
    * Caller owns unpersisting the returned state. `onRound`, when set,
    * observes (rank, wallSeconds, materialized post-merge state) after
    * each round — the hook [[graft.tools.BpeScale]] uses to record the
    * per-round wall-time curve and compression checkpoints at
    * production merge counts (the state is checkpointed, so a
    * checkpoint agg over it is vocabulary-grain cheap).
    */
  private[graft] def learnAndApply(s: SparkSession, dir: String,
      numMerges: Int = NumMerges,
      onRound: (Int, Double, DataFrame) => Unit = null)
      : (Seq[(Int, String, String, Long)], DataFrame) =
    learnAndApplyVocab(vocab0(s, dir), numMerges, onRound)

  /** [[learnAndApply]] over an arbitrary documents relation — the
    * [[BpeStore]] build entry point (the store is corpus-agnostic like
    * BandIndex/MediaSigStore; the declared queries feed it the testdata
    * corpus, the pipeline feeds it written staging tables).
    */
  private[ops] def learnAndApplyDocs(docs: DataFrame,
                                     numMerges: Int = NumMerges)
      : (Seq[(Int, String, String, Long)], DataFrame) =
    learnAndApplyVocab(vocabOf(docs), numMerges, null)

  private def learnAndApplyVocab(v0: DataFrame,
      numMerges: Int,
      onRound: (Int, Double, DataFrame) => Unit)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val merges = scala.collection.mutable.Buffer.empty[(Int, String, String, Long)]
    var v = v0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank = 1
    var done = false
    // On success the caller owns releasing the returned state; on
    // failure mid-loop nobody else can, so release the in-flight
    // state here (r8 advice: this leak guard existed only in
    // q_bpe_merges's since-removed private copy of the loop).
    var ok = false
    try {
      while (rank <= numMerges && !done) {
        val t0 = System.nanoTime()
        mergeRound(v) match {
          case None => done = true
          case Some(((l, r, tot), next)) =>
            merges += ((rank, l, r, tot))
            // Eager checkpoint IS the round's storage (truncated lineage
            // + block-resident rows); a Dataset-level persist on top
            // would store the same rows a second time as a columnar
            // cache entry nothing ever unpersisted (r9 verdict: 10
            // rounds x 2 queries of exactly that debris evicted the
            // minhash family mid-bench). Once nv is materialized the
            // previous round is dead — free its blocks NOW, not at the
            // ContextCleaner's leisure.
            val nv = GraftSqlBridge.freshLocalCheckpoint(next)
            v.unpersist()
            Checkpoints.free(v)
            v = nv
            if (onRound != null)
              onRound(rank, (System.nanoTime() - t0) / 1e9, v)
            rank += 1
        }
      }
      ok = true
    } finally if (!ok) { v.unpersist(); Checkpoints.free(v) }
    (merges.toSeq, v)
  }

  /** Corpus-scale encode pass against a segmentation map — ONE
    * definition for q_bpe_tokenize and the streaming ingest face
    * ([[graft.streaming.CorpusStream.bpeEncodeBatch]]): broadcast-hash
    * join of the (word → |segmentation|) map against the token stream,
    * per-doc integer sums, one IEEE division rounded 6dp. Stateless
    * per doc given the FROZEN stored map, so stream union == batch
    * exactly over any micro-batch split.
    */
  private[graft] def docTokenCounts(docs: DataFrame,
                                    segs: DataFrame): DataFrame = {
    val seg = segs.select(col("word"), size(col("syms")).as("n_sub"))
    docs
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(seg), col("w") === col("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("w"))).as("n_chars"),
        sum(col("n_sub").cast("long")).as("n_bpe"))
      .withColumn("compression",
        round(col("n_chars").cast("double") / col("n_bpe"), 6))
  }

  /** Stored-artifact state — the r13 replacement of the r10 session
    * memo: the 10-round driver loop runs ONCE at [[BpeStore]] build
    * time (first consumer pays, like every other stored family); every
    * later consumer — the four declared queries, the streaming encode
    * face, the pipeline — READS the merge table and the
    * (word → segmentation) map as bucketed scans. No release hook
    * needed: stored tables have no session-cache residency to manage.
    */
  private def storedState(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    BpeStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      BpeStore.tag(dir))

  /** Oracle stage chain `v0 .. v{n}` (+ per-round argmax relations
    * `b{r}`) — shared by the learn and encode oracles (at
    * [[NumMerges]]) and the merge-budget sweep oracle (at the sweep's
    * max budget) so every replay is the one definition.
    */
  private def oracleStagesTo(n: Int): String = {
    val stages = (1 to n).map { r =>
      val p = r - 1
      s"""e$r AS MATERIALIZED (SELECT word, cnt, syms,
         |    unnest(range(1, len(syms) + 1)) AS i FROM v$p),
         |b$r AS MATERIALIZED (SELECT syms[i] AS lhs, syms[i+1] AS rhs,
         |    CAST(sum(cnt) AS BIGINT) AS total
         |  FROM e$r WHERE i < len(syms) GROUP BY 1, 2
         |  ORDER BY total DESC, lhs ASC, rhs ASC LIMIT 1),
         |mt$r AS MATERIALIZED (SELECT word, i FROM e$r
         |  WHERE i < len(syms) AND syms[i] = (SELECT lhs FROM b$r)
         |    AND syms[i+1] = (SELECT rhs FROM b$r)),
         |mr$r AS MATERIALIZED (SELECT word, i,
         |    i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS grp
         |  FROM mt$r),
         |ma$r AS MATERIALIZED (SELECT word, i FROM (
         |  SELECT word, i, ROW_NUMBER() OVER (
         |      PARTITION BY word, grp ORDER BY i) AS rn FROM mr$r)
         |  WHERE rn % 2 = 1),
         |v$r AS MATERIALIZED (SELECT word, cnt, list(ns ORDER BY i) AS syms FROM (
         |  SELECT e.word, e.cnt, e.i,
         |    CASE WHEN a.i IS NOT NULL
         |      THEN (SELECT lhs FROM b$r) || (SELECT rhs FROM b$r)
         |      ELSE e.syms[e.i] END AS ns
         |  FROM e$r e
         |  LEFT JOIN ma$r a ON e.word = a.word AND e.i = a.i
         |  LEFT JOIN ma$r c ON e.word = c.word AND e.i = c.i + 1
         |  WHERE c.i IS NULL)
         |  GROUP BY word, cnt)""".stripMargin
    }.mkString(",\n")
    s"""t AS MATERIALIZED (SELECT ${TextFunctions.toksSql} AS toks FROM documents),
       |wf AS MATERIALIZED (SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM
       |    (SELECT unnest(toks) AS w FROM t) WHERE w <> '' GROUP BY w),
       |v0 AS MATERIALIZED (SELECT word, cnt, list_transform(range(1, length(word) + 1),
       |    i -> substr(word, i, 1)) AS syms FROM wf),
       |$stages""".stripMargin
  }

  private lazy val oracleStages: String = oracleStagesTo(NumMerges)

  /** Merge budgets the declared sweep prices: the SHIPPED default
    * [[NumMerges]] bracketed both ways (the probe/codebook-sweep
    * discipline — the shipped point must be a row on its own table).
    * Bounded by the corpus: the driver testdata's vocabulary caps at
    * ~89 learnable merges (measured, BpeScale), so 20 is a real
    * budget here; the PRODUCTION 500-merge point is measured through
    * the same store by [[graft.tools.BpeSweep]] on the synth
    * vocabulary (committed as BPE_SWEEP.json) — its oracle-tractable
    * twin is this table.
    */
  private[ops] val SweepBudgets = Seq(5, NumMerges, 20)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_bpe_merges",
      s"BPE merge-table learning (Sennrich et al. 2016): the first " +
        s"$NumMerges character-level merges over the corpus vocabulary " +
        "— (merge_rank, lhs, rhs, weighted pair count), the table a " +
        "subword tokenizer applies at encode time. Learned at " +
        "VOCABULARY grain (one corpus tokenize+count pass, then every " +
        "round touches only distinct-word symbol rows — the classic " +
        "scale trick that makes BPE tractable on any corpus); greedy " +
        "non-overlapping application via the run-parity window " +
        "formulation (see BpeQueries Scaladoc); argmax tiebreak " +
        "(count desc, lhs asc, rhs asc) and integer-only arithmetic " +
        "make the oracle replay exact. The oracle unrolls the " +
        s"$NumMerges rounds as generated CTE stages — same windows, " +
        "same parity rule, same tiebreaks.",
      (s, dir) => {
        // The stored merge table IS the result (r8 advice: one merge
        // driver, no drift; r13: the driver loop moved to BpeStore's
        // build — this query is a scan of the learned artifact).
        storedState(s, dir)._1.orderBy("merge_rank")
      },
      Some {
        // Unrolled oracle: v0 then NumMerges generated stages (shared
        // with the encode oracle via oracleStages). Stage r reads
        // v{r-1} and produces b{r} (the argmax) and v{r} (the merged
        // vocabulary) with the same run-parity windows.
        val out = (1 to NumMerges).map(r =>
          s"SELECT $r AS merge_rank, lhs, rhs, total AS pair_count FROM b$r")
          .mkString("\nUNION ALL\n")
        s"""WITH $oracleStages
           |SELECT * FROM (
           |$out
           |) ORDER BY merge_rank""".stripMargin
      }
    ),

    QueryDef(
      "q_bpe_encode",
      s"BPE encode measurement: the corpus vocabulary with all " +
        s"$NumMerges learned merges APPLIED (the tokenizer's encode " +
        "pass over its training corpus), reduced to the numbers that " +
        "decide whether a merge table is worth shipping — corpus-" +
        "weighted symbols before/after (chars vs BPE tokens), the " +
        "compression ratio, and the emergent subword vocabulary size " +
        "(distinct symbols in use after merging). Encode runs at " +
        "VOCABULARY grain like learning: applying a merge table to " +
        "100 TB of text is a broadcast-join of the (distinct word -> " +
        "segmentation) map against the token stream, so the expensive " +
        "part is exactly this vocabulary-grain replay. Integer counts " +
        "only; the one ratio is a single IEEE division rounded 6dp.",
      (s, dir) => {
        // Steady state this is a SCAN of the stored segmentation map
        // (the merge replay is paid once at BpeStore build — the
        // PqStore discipline: codes are encoded at build, ADC scans).
        val vFinal = storedState(s, dir)._2
        val stats = vFinal.agg(
          count(lit(1)).as("n_words"),
          sum(col("cnt") * length(col("word"))).as("chars_total"),
          sum(col("cnt") * size(col("syms"))).as("syms_total"))
        val vs = vFinal.select(explode(col("syms")).as("sym"))
          .agg(countDistinct(col("sym")).as("vocab_syms"))
        stats.crossJoin(vs).selectExpr(
          """stack(5,
            |'n_words', CAST(n_words AS DOUBLE),
            |'chars_total', CAST(chars_total AS DOUBLE),
            |'syms_total', CAST(syms_total AS DOUBLE),
            |'subword_vocab', CAST(vocab_syms AS DOUBLE),
            |'compression_x', round(CAST(chars_total AS DOUBLE)/syms_total, 6)
            |) AS (metric, value)""".stripMargin)
          .orderBy("metric")
      },
      Some {
        s"""WITH $oracleStages,
           |st AS (SELECT count(*) AS n_words,
           |    sum(cnt * length(word)) AS chars_total,
           |    sum(cnt * len(syms)) AS syms_total FROM v$NumMerges),
           |vs AS (SELECT count(DISTINCT sym) AS vocab_syms FROM
           |  (SELECT unnest(syms) AS sym FROM v$NumMerges))
           |SELECT metric, value FROM (
           |  SELECT 'n_words' AS metric, CAST(n_words AS DOUBLE) AS value FROM st
           |  UNION ALL SELECT 'chars_total', CAST(chars_total AS DOUBLE) FROM st
           |  UNION ALL SELECT 'syms_total', CAST(syms_total AS DOUBLE) FROM st
           |  UNION ALL SELECT 'subword_vocab', CAST(vocab_syms AS DOUBLE) FROM vs
           |  UNION ALL SELECT 'compression_x',
           |    round(CAST(chars_total AS DOUBLE)/syms_total, 6) FROM st)
           |ORDER BY metric""".stripMargin
      }
    ),

    QueryDef(
      "q_bpe_tokenize",
      "Corpus-grain BPE tokenization — the MATERIALIZATION step the " +
        "encode measurement argues about: every document's token " +
        "count under the learned merge table, produced by broadcasting " +
        "the (distinct word -> segmentation length) map against the " +
        "corpus token stream. This is the 100 TB shape of 'tokenize " +
        "the corpus': the expensive merge replay ran once at " +
        "VOCABULARY grain (the shared memoized state), and the " +
        "corpus-scale pass is a map-side broadcast-hash join + " +
        "per-doc sum — no shuffle of text, no per-document merge " +
        "loop. Emits per doc: words, chars, BPE tokens, and the " +
        "doc-level compression ratio (chars/token, the per-document " +
        "token-budget planning number). Integer counts; one IEEE " +
        "division rounded 6dp.",
      (s, dir) => {
        // The 100 TB encode shape, now reading the STORED map: the
        // vocabulary-grain replay was paid at BpeStore build; this is
        // a broadcast-hash join of a bucketed scan against the corpus
        // token stream + per-doc sum (docTokenCounts — one definition
        // with the streaming ingest face).
        docTokenCounts(Tables.par(s, dir, "documents"),
          storedState(s, dir)._2)
          .orderBy("doc_id")
      },
      Some {
        s"""WITH $oracleStages,
           |dt AS (SELECT doc_id, w FROM (
           |  SELECT doc_id, unnest(toks) AS w FROM
           |    (SELECT doc_id, ${TextFunctions.toksSql} AS toks
           |     FROM documents)) WHERE w <> ''),
           |j AS (SELECT dt.doc_id, dt.w, len(v.syms) AS n_sub
           |  FROM dt JOIN v$NumMerges v ON dt.w = v.word)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
           |  CAST(sum(n_sub) AS BIGINT) AS n_bpe,
           |  round(CAST(sum(length(w)) AS DOUBLE) / sum(n_sub), 6)
           |    AS compression
           |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q_bpe_fertility",
      "Tokenizer fertility by language (Rust et al. 2021: tokens per " +
        "word — the metric that exposes a tokenizer systematically " +
        "over-segmenting some languages, inflating their compute cost " +
        "and shrinking their effective context): per-lang docs, words, " +
        "chars, BPE tokens under the learned merge table, fertility " +
        "(tokens/word) and chars/token. Same corpus-scale shape as " +
        "the per-doc tokenize pass (broadcast segmentation map, one " +
        "agg) at language grain — the fairness report a multilingual " +
        "training run reads before fixing the merge budget.",
      (s, dir) => {
        val seg = storedState(s, dir)._2
          .select(col("word"), size(col("syms")).as("n_sub"))
        Tables.par(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            explode(TextFunctions.tokens(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .join(broadcast(seg), col("w") === col("word"))
          .groupBy("lang")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_words"),
            sum(length(col("w"))).as("n_chars"),
            sum(col("n_sub").cast("long")).as("n_bpe"))
          .withColumn("fertility",
            round(col("n_bpe").cast("double") / col("n_words"), 6))
          .withColumn("chars_per_token",
            round(col("n_chars").cast("double") / col("n_bpe"), 6))
          .orderBy("lang")
      },
      Some {
        s"""WITH $oracleStages,
           |dt AS (SELECT doc_id, lang, w FROM (
           |  SELECT doc_id, lang, unnest(toks) AS w FROM
           |    (SELECT doc_id, lang, ${TextFunctions.toksSql} AS toks
           |     FROM documents)) WHERE w <> ''),
           |j AS (SELECT dt.doc_id, dt.lang, dt.w, len(v.syms) AS n_sub
           |  FROM dt JOIN v$NumMerges v ON dt.w = v.word)
           |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           |  CAST(count(*) AS BIGINT) AS n_words,
           |  CAST(sum(length(w)) AS BIGINT) AS n_chars,
           |  CAST(sum(n_sub) AS BIGINT) AS n_bpe,
           |  round(CAST(sum(n_sub) AS DOUBLE) / count(*), 6) AS fertility,
           |  round(CAST(sum(length(w)) AS DOUBLE) / sum(n_sub), 6)
           |    AS chars_per_token
           |FROM j GROUP BY lang ORDER BY lang""".stripMargin
      }
    ),

    QueryDef(
      "q_bpe_merge_sweep",
      s"Tokenizer merge-budget sweep (the q_pq_codebook_sweep " +
        s"discipline on the tokenizer knob, r13 verdict #7): budgets " +
        s"${SweepBudgets.mkString("{", ", ", "}")} each as its own " +
        s"geometry-tagged stored BpeStore — the shipped $NumMerges-" +
        "merge default is a row of its own table, bracketed both " +
        "ways — reporting per budget: merges actually learned (an " +
        "exhaust tripwire — the loop stops at the vocabulary's " +
        "capacity), vocabulary words, corpus-weighted chars and " +
        "symbols, and the encode compression chars/syms the budget " +
        "buys. The marginal-compression read is the table a run " +
        "fixes its merge budget from; the PRODUCTION 500-merge point " +
        "runs the SAME store build on the synth vocabulary " +
        "(tools.BpeSweep -> BPE_SWEEP.json — the testdata corpus " +
        "exhausts at ~89 merges, measured). Shape: each budget reads " +
        "its stored tables (vocab-grain scans, built once per " +
        "session); the oracle replays the merge loop UNROLLED to the " +
        "max budget and slices each budget's row from the one chain, " +
        "learned counts from per-round EXISTS — the deliberate " +
        "exhaust-mismatch tripwire.",
      (s, dir) => {
        val docs = Tables.par(s, dir, "documents")
        SweepBudgets.map { b =>
          val tg = BpeStore.tag(dir, b)
          val (merges, segs) = BpeStore.buildOrLoad(s, docs, tg,
            numMerges = b)
          val m = merges.agg(count(lit(1)).as("merges_learned"))
          segs.agg(
              count(lit(1)).as("vocab_words"),
              sum(col("cnt") * length(col("word"))).as("chars_total"),
              sum(col("cnt") * size(col("syms"))).as("syms_total"))
            .crossJoin(broadcast(m))
            .select(lit(b).as("merge_budget"), col("merges_learned"),
              col("vocab_words"), col("chars_total"), col("syms_total"),
              round(col("chars_total").cast("double") /
                col("syms_total"), 6).as("compression_x"))
        }.reduce(_.unionAll(_)).orderBy("merge_budget")
      },
      Some {
        val maxB = SweepBudgets.max
        def learned(b: Int) = (1 to b)
          .map(r => s"(CASE WHEN EXISTS(SELECT 1 FROM b$r) " +
            "THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val rows = SweepBudgets.map { b =>
          s"""SELECT $b AS merge_budget,
             |  CAST(${learned(b)} AS BIGINT) AS merges_learned,
             |  CAST(count(*) AS BIGINT) AS vocab_words,
             |  CAST(sum(cnt * length(word)) AS BIGINT) AS chars_total,
             |  CAST(sum(cnt * len(syms)) AS BIGINT) AS syms_total,
             |  round(CAST(sum(cnt * length(word)) AS DOUBLE)
             |    / sum(cnt * len(syms)), 6) AS compression_x
             |FROM v$b""".stripMargin
        }
        s"""WITH ${oracleStagesTo(maxB)}
           |SELECT * FROM (
           |${rows.mkString("\nUNION ALL\n")}
           |) ORDER BY merge_budget""".stripMargin
      }
    )
  )
}
