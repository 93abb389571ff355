package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators over `documents` (SURVEY.md §2 H4): per-doc
  * stats, token counting (whitespace + BPE-ish regex), n-gram-heuristic
  * language ID, quality scoring, and rolling-hash fingerprinting. All
  * built-in expressions (codegen'd end to end); every ratio is a single
  * IEEE double division of exact integers so the DuckDB oracle matches.
  */
object TextQueries {

  /** Tiny per-language stopword marker lists for the n-gram/stopword
    * language heuristic. Deterministic and inlined into both engines.
    */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de", "shi", "le", "wo", "ni"))

  private def sqlList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ",", "]")

  /** Flattened stopword list shared by the quality gate here, the
    * composed corpus filter, and the streaming curation pipeline
    * ([[graft.streaming.CorpusStream]]) — one definition so batch and
    * streaming cannot drift.
    */
  private[graft] val stopwords: Seq[String] = langMarkers.flatMap(_._2).distinct.sorted

  private[graft] def nStop(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords.map(x => x: Any): _*)))

  /** The 3-point document quality gate (length, stopword presence, token
    * count) — the single expression both q_quality_score/q_corpus_filter
    * and the streaming twin apply.
    */
  private[graft] def qualityPoints(nChars: Column, nTok: Column,
                                   nStopC: Column): Column =
    when(nTok >= 10, lit(1)).otherwise(lit(0)) +
      when(nStopC > 0, lit(1)).otherwise(lit(0)) +
      when(nChars >= 64, lit(1)).otherwise(lit(0))


  /** Heavy-hitter threshold AND sketch capacity: report terms whose
    * count exceeds 1/HeavyK of all terms; a per-partition SpaceSaving
    * summary of HeavyK counters is guaranteed to contain every such
    * term (Metwally et al. 2005), so the exact recount over the
    * candidate union is exact — never a sample.
    */
  private[graft] val HeavyK = 1024

  /** PMI collocation floor: bigrams below this count are too noisy to
    * rank (PMI of a hapax pair is maximal by construction). */
  private val PmiMinCount = 5

  /** ln(2) as ONE double literal shared by the Spark plan and the
    * DuckDB oracle text (Double.toString round-trips the exact value) —
    * the q_lm_perplexity convention. Declared before [[defs]]: the
    * oracle string interpolates it at object initialization.
    */
  private val Ln2: Double = math.log(2.0)

  /** SpaceSaving frequent-items sketch over one partition: at most `k`
    * counters; an untracked arrival evicts the min-count entry and
    * inherits its count + 1. Guarantee used here: any item with true
    * partition count > partitionSize/k is among the surviving keys —
    * so unioning per-partition survivors yields a SUPERSET of the
    * global heavy hitters for threshold total/k (proved in
    * HeavyHitterSpec by differential test against brute force).
    * Memory is O(k) per task regardless of per-task vocabulary — the
    * property a plain hash aggregate cannot give at 100 TB.
    */
  private[graft] def spaceSavingAdd(
      counts: scala.collection.mutable.HashMap[String, Long],
      t: String, k: Int): Unit =
    counts.get(t) match {
      case Some(c) => counts.update(t, c + 1)
      case None if counts.size < k => counts.update(t, 1L)
      case None =>
        // k is a small constant: the linear min scan is O(k) per
        // eviction; a production sketch would keep a min-heap.
        var minKey: String = null
        var minVal = Long.MaxValue
        // foreachEntry: no per-entry tuple allocation in the scan
        counts.foreachEntry { (key, v) =>
          if (v < minVal || (v == minVal && (minKey == null || key < minKey))) {
            minVal = v; minKey = key
          }
        }
        counts.remove(minKey)
        counts.update(t, minVal + 1)
    }

  private[graft] def spaceSavingKeys(it: Iterator[String], k: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach(spaceSavingAdd(counts, _, k))
    counts.keysIterator
  }

  /** Sequential (non-distinct) word bigrams of a token array — the
    * occurrence stream q_vocab_ngrams counts, q_heavy_hitters sketches,
    * and the streaming sketch ([[graft.streaming.CorpusStream]])
    * consumes: ONE definition so the three cannot drift.
    */
  private[graft] def seqBigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - lit(2)),
        i => concat_ws(" ",
          element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast(ArrayType(StringType)))

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_text_stats",
      "Per-language corpus stats: docs, token totals, char totals, mean " +
        "tokens/doc (exact int division at the end).",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(col("toks"))).as("total_tokens"),
            sum(length(col("text"))).as("total_chars"),
            (sum(size(col("toks"))).cast(DoubleType) / count(lit(1)))
              .as("avg_tokens_per_doc"))
          .orderBy("lang")
      },
      Some(s"""SELECT lang, COUNT(*) AS n_docs,
              |  CAST(SUM(len($toksSql)) AS BIGINT) AS total_tokens,
              |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
              |  CAST(SUM(len($toksSql)) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc
              |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    ),

    QueryDef(
      "q_token_count",
      "Token counting: whitespace tokens and a BPE-ish regex tokenizer " +
        "(alnum runs or single non-space symbols) via regexp_count.",
      (s, dir) => {
        val bpe = "[a-z0-9]+|[^a-z0-9\\s]"
        Tables.t(s, dir, "documents")
          .select(
            col("doc_id"),
            size(tokens(col("text"))).as("ws_tokens"),
            regexp_count(lower(col("text")), lit(bpe)).as("bpe_tokens"),
            length(col("text")).as("n_chars_actual"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, len($toksSql) AS ws_tokens,
              |  len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
              |  length(text) AS n_chars_actual
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_context_fit",
      "Context-window planning curve: for each candidate window size L, " +
        "the fraction of docs that FIT (ws tokens <= L) and the token " +
        "coverage under truncation (sum(min(tokens, L)) / sum(tokens)) " +
        "— the two numbers that decide a training run's sequence " +
        "length: fit-rate prices padding waste at small L, truncation " +
        "coverage prices data loss at small L, and the window is " +
        "chosen where the coverage curve flattens. One corpus pass: " +
        "all windows' conditional sums fuse into a single aggregate, " +
        "then unpivot (the C1-C4 fusion argument); integer sums, two " +
        "IEEE divisions rounded 6dp. Window candidates are scaled to " +
        "the test corpus (docs ~40-60 words); production uses the " +
        "same query at 2k-8k.",
      (s, dir) => {
        val windows = PackingQueries.WasteWindows
        val n = size(tokens(col("text")))
        val aggs = Seq(count(lit(1)).as("n_docs"),
          sum(n.cast("long")).as("tok_total")) ++
          windows.flatMap(l => Seq(
            sum(when(n <= l, 1L).otherwise(0L)).as(s"fit_$l"),
            sum(least(n.cast("long"), lit(l.toLong))).as(s"cov_$l")))
        val rows = windows.map(l => struct(lit(l).as("win"),
          col(s"fit_$l").as("n_fit"),
          round(col(s"fit_$l").cast("double") / col("n_docs"), 6)
            .as("fit_frac"),
          round(col(s"cov_$l").cast("double") / col("tok_total"), 6)
            .as("trunc_coverage")))
        Tables.t(s, dir, "documents")
          .agg(aggs.head, aggs.tail: _*)
          .select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("win")
      },
      Some {
        val windows = PackingQueries.WasteWindows
        val sels = windows.map { l =>
          s"""SELECT $l AS win,
             |  CAST(sum(CASE WHEN len($toksSql) <= $l THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_fit,
             |  round(CAST(sum(CASE WHEN len($toksSql) <= $l THEN 1 ELSE 0 END)
             |    AS DOUBLE) / count(*), 6) AS fit_frac,
             |  round(CAST(sum(least(len($toksSql), $l)) AS DOUBLE) /
             |    sum(len($toksSql)), 6) AS trunc_coverage
             |FROM documents""".stripMargin
        }
        sels.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
          "\n) ORDER BY win")
      }
    ),

    QueryDef(
      "q_lang_id",
      "Language-ID heuristic: stopword-marker hit counts per language, " +
        "argmax with fixed tie order (greatest hit count, then language " +
        "name) — pure set intersection, no UDF.",
      (s, dir) => {
        val toks = array_distinct(tokens(col("text")))
        val scored = langMarkers.foldLeft(
          Tables.t(s, dir, "documents").withColumn("toks", toks)) {
          case (df, (lg, words)) =>
            df.withColumn(s"hits_$lg",
              size(array_intersect(col("toks"),
                array(words.map(lit): _*))))
        }
        val best = langMarkers.map { case (lg, _) =>
          struct(col(s"hits_$lg").as("h"), lit(lg).as("lg"))
        }
        scored
          .withColumn("best", greatest(best: _*))
          .select(
            col("doc_id"), col("lang").as("labeled_lang"),
            col("best.lg").as("predicted_lang"),
            col("best.h").as("marker_hits"))
          .orderBy("doc_id")
      },
      Some {
        // greatest(struct(h, lg)) picks max hits then max language name —
        // mirror with a window over an unpivoted score list.
        val scores = langMarkers.map { case (lg, words) =>
          s"SELECT doc_id, lang, '$lg' AS lg, len(list_intersect(list_distinct($toksSql), ${sqlList(words)})) AS h FROM documents"
        }.mkString("\nUNION ALL\n")
        s"""WITH scores AS ($scores),
           |ranked AS (
           |  SELECT doc_id, lang, lg, h,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lg DESC) AS rn
           |  FROM scores)
           |SELECT doc_id, lang AS labeled_lang, lg AS predicted_lang,
           |  h AS marker_hits
           |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q_lang_id_measured",
      "MEASURED language ID (the falsifiability upgrade of q_lang_id's " +
        "marker heuristic, r10 verdict #5): a multinomial naive-Bayes " +
        "char-trigram scorer TRAINED on the labeled half of the corpus " +
        "(doc_id % 2 == 0) and scored on the held-out half, with " +
        "held-out accuracy EMITTED per language and overall next to the " +
        "always-predict-majority baseline. On this synthetic corpus the " +
        "honest answer is ~chance — all languages draw from one shared " +
        "vocabulary, so the label carries no lexical signal (the same " +
        "no-signal truth SCALE.md documents for the embedding labels) — " +
        "and the row PROVES it instead of asserting it; " +
        "LangIdMeasuredSpec plants a corpus with real per-language " +
        "character distributions and the same scorer measures ~1.0. " +
        "Scale: the model is (lang, gram) counts — V×L rows, broadcast " +
        "— trained in one agg; scoring is gram-join + per-(doc,lang) " +
        "decimal-exact log-likelihood sums; no driver-side state. Grams " +
        "via the native per-position CharGramSeq (the multiset sibling " +
        "of CharShingles).",
      (s, dir) => {
        val G = 3
        val docs = Tables.par(s, dir, "documents")
          .select(col("doc_id"), col("lang"), normText(col("text")).as("nt"),
            (col("doc_id") % 2 === 0).as("tr"))
        val grams = docs.select(col("doc_id"), col("lang"), col("tr"),
          explode(graft.functions.CharGramSeq(col("nt"), G)).as("g"))
        // r18 (§3.3/§5): the (lang, gram) model relation is read THREE
        // times downstream (tt, vv, and the broadcast scoring join) —
        // un-materialized, each reference re-ran the train-half corpus
        // explode + count (the r17 plan audit's 26 Exchanges). It is
        // model-sized (V×L rows) by construction at any corpus scale,
        // so an eager localCheckpoint (the repo's fixpoint-state
        // pattern — no cache entry to leak) truncates all three to one
        // LogicalRDD scan.
        val tg = org.apache.spark.sql.GraftSqlBridge.freshLocalCheckpoint(
          grams.filter(col("tr"))
          .groupBy(col("lang").as("plang"), col("g"))
          .agg(count(lit(1)).as("c")))
        // r19 (r18 ADVICE #2): free the model checkpoint's blocks with
        // the NbModel family instead of leaving them to GC.
        SharedCaches.onRelease(SharedCaches.NbModel)(() =>
          Checkpoints.free(tg))
        // totals + vocab derive from the (lang, gram) model relation —
        // ONE train-corpus explode pass, not two; these derived aggs
        // are model-sized (V×L rows), not corpus-sized
        val tt = tg.groupBy("plang").agg(sum(col("c")).as("t"))
        val vv = tg.agg(countDistinct(col("g")).as("v"))
        val pr = docs.filter(col("tr"))
          .groupBy(col("lang").as("plang")).agg(count(lit(1)).as("nd"))
        val ntr = docs.filter(col("tr")).agg(count(lit(1)).as("n"))
        // model header: 5 rows (lang, total grams, vocab size, log prior)
        val li = tt.join(pr, "plang").crossJoin(vv).crossJoin(ntr)
          .select(col("plang"), col("t"), col("v"),
            round(log(col("nd") / col("n")), 9).as("lp"))
        val dec = DecimalType(38, 12)
        // r19 (§2.3 shuffle/compute fewer bytes, §1.2 per-row work —
        // r18 verdict "Next round" #4): the scoring previously blew
        // every eval (doc, gram) row up ×|languages| through a
        // crossJoin BEFORE the model join, evaluated the smoothed
        // log-probability PER (doc, gram, lang) ROW, folded with a
        // (doc, lang)-grain groupBy, and ranked with a per-doc
        // row_number window. The smoothed weight is a function of
        // (lang, gram) alone — compute it ONCE at model grain (V×L
        // log() calls instead of |eval pairs|×L), pivot to one wide
        // row per gram (per-language weight vector, model-sized,
        // broadcast — the same bytes the old tg broadcast carried),
        // join eval grams 1:1, and aggregate per doc with one decimal
        // sum PER LANGUAGE COLUMN. The argmax is then a per-row
        // greatest() over the L score structs — the ×L row blow-up,
        // the (doc,lang)-grain exchange and the window sort all
        // disappear. The language header (L rows) is collected to the
        // driver (the repo's artifact-derivation convention, cf.
        // fusionLegs' term-universe collect); the OOV weight w0 is
        // computed BY Spark inside that collect so it stays
        // bit-identical to the per-row expression it replaces. Term
        // value identity: round(m * round(log((c+1)/(t+v)), 9), 9)
        // with c=0 for unmatched grams — the same expression, reading
        // a precomputed weight; the decimal sums add the same addends.
        val hdr = li.select(col("plang"), col("lp"),
            round(log((lit(0L) + 1) / (col("t") + col("v"))), 9).as("w0"))
          .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
          .sortBy(_._1).toSeq
        val langs = hdr.map(_._1)
        val mj = broadcast(pr.orderBy(col("nd").desc, col("plang").asc)
          .limit(1).select(col("plang").as("mlang")))
        val j =
          if (hdr.isEmpty)
            // empty train half: no model, no predictions — the same
            // empty result the un-pivoted plan produced
            docs.filter(!col("tr"))
              .select(col("doc_id"), col("lang").as("lang0"),
                lit(null).cast("string").as("plang"),
                lit(null).cast("string").as("mlang"))
              .where(lit(false))
          else {
            val gw = tg.join(broadcast(li.select("plang", "t", "v")), "plang")
              .select(col("g"), col("plang"),
                round(log((col("c") + 1) / (col("t") + col("v"))), 9).as("w"))
            val gwWide = broadcast(gw.groupBy("g")
              .pivot("plang", langs).agg(first(col("w")))
              .toDF("g" +: langs.map("w_" + _): _*))
            val eg = grams.filter(!col("tr"))
              .groupBy("doc_id", "g").agg(count(lit(1)).as("m"))
            val tsCols = hdr.map { case (l, _, w0) =>
              sum(round(col("m") * coalesce(col(s"w_$l"), lit(w0)), 9)
                .cast(dec)).as(s"ts_$l") }
            val tsWide = eg.join(gwWide, Seq("g"), "left")
              .groupBy("doc_id").agg(tsCols.head, tsCols.tail: _*)
            // per-row argmax over the L score structs: max score, tie
            // -> smallest language name (hdr sorted; ni = -index, so
            // max ni = min index) — the old window's (score desc,
            // plang asc) pick exactly
            val scoreStructs = hdr.zipWithIndex.map { case ((l, lp, _), i) =>
              struct((coalesce(col(s"ts_$l"), lit(0).cast(dec)) +
                lit(lp).cast(dec)).as("score"), lit(-i).as("ni")) }
            val best =
              if (scoreStructs.size == 1) scoreStructs.head
              else greatest(scoreStructs: _*)
            docs.filter(!col("tr"))
              .select(col("doc_id"), col("lang").as("lang0"))
              .join(tsWide, Seq("doc_id"), "left")
              .withColumn("best", best)
              .withColumn("plang", element_at(
                array(langs.map(lit): _*), -col("best.ni") + lit(1)))
              .crossJoin(mj)
          }
        def accCols(g: org.apache.spark.sql.RelationalGroupedDataset) = g.agg(
          count(lit(1)).as("n_eval"),
          sum(when(col("plang") === col("lang0"), 1).otherwise(0))
            .cast("long").as("n_correct"),
          round(sum(when(col("plang") === col("lang0"), 1).otherwise(0))
            .cast("double") / count(lit(1)), 6).as("accuracy"),
          round(sum(when(col("lang0") === col("mlang"), 1).otherwise(0))
            .cast("double") / count(lit(1)), 6).as("baseline_acc"))
        accCols(j.groupBy(lit("*").as("lang")))
          .union(accCols(j.groupBy(col("lang0").as("lang"))))
          .orderBy("lang")
      },
      Some {
        val acc = (grp: String) =>
          s"""SELECT $grp AS lang, CAST(count(*) AS BIGINT) AS n_eval,
             |  CAST(sum(CASE WHEN plang = lang0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  round(CAST(sum(CASE WHEN plang = lang0 THEN 1 ELSE 0 END)
             |    AS DOUBLE)/count(*), 6) AS accuracy,
             |  round(CAST(sum(CASE WHEN lang0 = mlang THEN 1 ELSE 0 END)
             |    AS DOUBLE)/count(*), 6) AS baseline_acc
             |FROM j""".stripMargin
        s"""WITH d AS (SELECT doc_id, lang, $normSql AS nt,
           |    doc_id % 2 = 0 AS tr FROM documents),
           |g AS (SELECT doc_id, lang, tr,
           |    unnest(list_transform(range(1, len(nt)-1),
           |      i -> substr(nt, i, 3))) AS g
           |  FROM d WHERE len(nt) >= 3),
           |tg AS (SELECT lang AS plang, g, count(*) AS c FROM g
           |  WHERE tr GROUP BY 1, 2),
           |tt AS (SELECT lang AS plang, count(*) AS t FROM g
           |  WHERE tr GROUP BY 1),
           |vv AS (SELECT count(DISTINCT g) AS v FROM tg),
           |pr AS (SELECT lang AS plang, count(*) AS nd FROM d
           |  WHERE tr GROUP BY 1),
           |ntr AS (SELECT count(*) AS n FROM d WHERE tr),
           |li AS (SELECT tt.plang, tt.t, vv.v,
           |    round(ln(CAST(pr.nd AS DOUBLE) / ntr.n), 9) AS lp
           |  FROM tt JOIN pr USING (plang), vv, ntr),
           |eg AS (SELECT doc_id, g, count(*) AS m FROM g
           |  WHERE NOT tr GROUP BY 1, 2),
           |terms AS (SELECT eg.doc_id, li.plang,
           |    CAST(round(eg.m * round(ln(
           |      CAST(coalesce(tg.c, 0) + 1 AS DOUBLE) / (li.t + li.v)), 9),
           |      9) AS DECIMAL(38,12)) AS term
           |  FROM eg CROSS JOIN li
           |  LEFT JOIN tg ON tg.plang = li.plang AND tg.g = eg.g),
           |ts AS (SELECT doc_id, plang, sum(term) AS ts FROM terms
           |  GROUP BY 1, 2),
           |base AS (SELECT d.doc_id, li.plang, li.lp FROM d, li
           |  WHERE NOT d.tr),
           |sc AS (SELECT base.doc_id, base.plang,
           |    coalesce(ts.ts, CAST(0 AS DECIMAL(38,12)))
           |      + CAST(base.lp AS DECIMAL(38,12)) AS score
           |  FROM base LEFT JOIN ts USING (doc_id, plang)),
           |pred AS (SELECT doc_id, plang FROM (SELECT doc_id, plang,
           |    ROW_NUMBER() OVER (PARTITION BY doc_id
           |      ORDER BY score DESC, plang ASC) AS rn FROM sc)
           |  WHERE rn = 1),
           |mj AS (SELECT plang AS mlang FROM pr
           |  ORDER BY nd DESC, plang ASC LIMIT 1),
           |j AS (SELECT d.lang AS lang0, p.plang, mj.mlang
           |  FROM d JOIN pred p USING (doc_id), mj WHERE NOT d.tr)
           |SELECT * FROM (
           |${acc("'*'")}
           |UNION ALL
           |${acc("lang0")} GROUP BY lang0
           |) ORDER BY lang""".stripMargin
      }
    ),

    QueryDef(
      "q_quality_score",
      "Document quality scoring: length, mean word length, stopword " +
        "ratio, alpha ratio -> composite score (exact int ratios, single " +
        "final rounding).",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .withColumn("n_tok", size(col("toks")))
          .withColumn("n_alpha",
            length(regexp_replace(lower(col("text")), "[^a-z]", "")))
          .withColumn("n_stop", nStop(col("toks")))
          .select(
            col("doc_id"),
            col("n_tok"),
            round(col("n_alpha").cast(DoubleType) /
              greatest(length(col("text")), lit(1)), 6).as("alpha_ratio"),
            round(col("n_stop").cast(DoubleType) /
              greatest(col("n_tok"), lit(1)), 6).as("stopword_ratio"),
            qualityPoints(length(col("text")), col("n_tok"), col("n_stop"))
              .as("quality_points"))
          .orderBy("doc_id")
      },
      Some {
        val stop = sqlList(stopwords) // the ONE shared list — no oracle drift
        s"""WITH t AS (
           |  SELECT doc_id, text, $toksSql AS toks FROM documents
           |), m AS (
           |  SELECT doc_id, text, len(toks) AS n_tok,
           |    length(regexp_replace(lower(text),'[^a-z]','','g')) AS n_alpha,
           |    len(list_filter(toks, t -> list_contains($stop, t))) AS n_stop
           |  FROM t)
           |SELECT doc_id, n_tok,
           |  round(CAST(n_alpha AS DOUBLE) / greatest(length(text), 1), 6) AS alpha_ratio,
           |  round(CAST(n_stop AS DOUBLE) / greatest(n_tok, 1), 6) AS stopword_ratio,
           |  (CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END
           |   + CASE WHEN n_stop > 0 THEN 1 ELSE 0 END
           |   + CASE WHEN length(text) >= 64 THEN 1 ELSE 0 END) AS quality_points
           |FROM m ORDER BY doc_id""".stripMargin
      }
    ),

    QueryDef(
      "q_doc_fingerprint",
      "Document fingerprinting: full-text md5 plus a winnowing-style " +
        "min-hash over char-8-gram rolling windows (robust to reordering).",
      (s, dir) => {
        // staged: the rolling-window lambda must reference the normalized
        // text as an attribute (else normText re-runs per window position)
        val nt = col("nt")
        Tables.t(s, dir, "documents")
          .select(col("doc_id"), normText(col("text")).as("nt"))
          .select(
            col("doc_id"),
            substring(md5(nt), 1, 16).as("exact_fp"),
            array_min(transform(
              when(length(nt) >= 8,
                sequence(lit(1), length(nt) - 7)).otherwise(array(lit(1))),
              i => substring(md5(nt.substr(i, lit(8))), 1, 16)))
              .as("winnow_fp"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $normSql AS nt FROM documents)
              |SELECT doc_id, substr(md5(nt),1,16) AS exact_fp,
              |  list_aggregate(list_transform(
              |    CASE WHEN length(nt) >= 8 THEN range(1, length(nt)-6) ELSE [1] END,
              |    i -> substr(md5(substr(nt,i,8)),1,16)),'min') AS winnow_fp
              |FROM t ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_vocab_overlap",
      "Cross-source vocabulary overlap matrix (the H3s' source-overlap " +
        "idea at VOCABULARY grain — the domain-similarity table a " +
        "mixture design reads: two sources with near-identical " +
        "vocabularies are one domain for weighting purposes, however " +
        "distinct their labels): per source pair (a < b), each side's " +
        "distinct-word vocabulary size, the shared-word count, and the " +
        "vocabulary Jaccard |Va∩Vb| / |Va|+|Vb|−|Va∩Vb|. Shape: one " +
        "corpus pass reduces to the (source, word) DISTINCT relation " +
        "(vocab grain — MBs at 100 TB); the pair intersection is a " +
        "word-keyed self-equi-join of that tiny relation; the pair " +
        "frame is sources² rows (a handful) built from a broadcast " +
        "cross of the per-source sizes so zero-overlap pairs still " +
        "emit their row. Integer counts, one IEEE division rounded 6dp.",
      (s, dir) => {
        val v = Tables.t(s, dir, "documents")
          .select(col("source"), explode(tokens(col("text"))).as("w"))
          .filter(col("w") =!= "").distinct()
        val sizes = v.groupBy("source").agg(count(lit(1)).as("vocab"))
        val inter = v.select(col("source").as("source_a"), col("w"))
          // vocabulary-grain relation: MBs at ANY corpus scale (distinct
          // words × sources), so one side broadcasts justifiably
          .join(broadcast(v.select(col("source").as("source_b"), col("w"))),
            "w")
          .filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_shared"))
        val pairs = sizes.select(col("source").as("source_a"),
            col("vocab").as("vocab_a"))
          .crossJoin(sizes.select(col("source").as("source_b"),
            col("vocab").as("vocab_b")))
          .filter(col("source_a") < col("source_b"))
        pairs.join(inter, Seq("source_a", "source_b"), "left")
          .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
          .withColumn("jaccard",
            round(col("n_shared").cast("double") /
              (col("vocab_a") + col("vocab_b") - col("n_shared")), 6))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH v AS (SELECT DISTINCT source, w FROM (
              |    SELECT source, unnest($toksSql) AS w FROM documents)
              |  WHERE w <> ''),
              |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab
              |  FROM v GROUP BY source),
              |iv AS (SELECT a.source AS source_a, b.source AS source_b,
              |    CAST(count(*) AS BIGINT) AS n_shared
              |  FROM v a JOIN v b ON a.w = b.w AND a.source < b.source
              |  GROUP BY 1, 2),
              |p AS (SELECT a.source AS source_a, a.vocab AS vocab_a,
              |    b.source AS source_b, b.vocab AS vocab_b
              |  FROM sz a, sz b WHERE a.source < b.source)
              |SELECT source_a, source_b, vocab_a, vocab_b,
              |  COALESCE(n_shared, 0) AS n_shared,
              |  round(CAST(COALESCE(n_shared, 0) AS DOUBLE) /
              |    (vocab_a + vocab_b - COALESCE(n_shared, 0)), 6)
              |    AS jaccard
              |FROM p LEFT JOIN iv USING (source_a, source_b)
              |ORDER BY source_a, source_b""".stripMargin)
    ),

    QueryDef(
      "q_vocab_ngrams",
      "Corpus vocabulary induction: top-50 word bigrams by term " +
        "frequency (count desc, bigram asc tiebreak) — the n-gram count " +
        "pass a tokenizer/vocab build runs over the whole corpus. " +
        "Shape: one scan -> per-doc bigram array -> explode -> partial " +
        "agg -> one shuffle on the ngram key -> TakeOrdered top-k; at " +
        "100 TB the map-side partial agg collapses each task's counts " +
        "before the only shuffle, and top-k never sorts globally.",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .select(explode(seqBigrams(col("toks"))).as("ngram"))
          .groupBy("ngram")
          .agg(count(lit(1)).as("n_occurrences"))
          .orderBy(col("n_occurrences").desc, col("ngram").asc)
          .limit(50)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |b AS (SELECT unnest(CASE WHEN len(toks) >= 2
              |    THEN list_transform(range(1, len(toks)), i -> toks[i]||' '||toks[i+1])
              |    ELSE []::VARCHAR[] END) AS ngram FROM t)
              |SELECT ngram, COUNT(*) AS n_occurrences FROM b
              |GROUP BY ngram ORDER BY n_occurrences DESC, ngram LIMIT 50""".stripMargin)
    ),

    QueryDef(
      "q_pmi_bigrams",
      s"Collocation extraction: top-25 word bigrams by pointwise " +
        s"mutual information, min count $PmiMinCount (Church & Hanks " +
        "1990 — the phrase-induction signal a tokenizer/vocab build " +
        "uses to promote multi-word units; raw frequency surfaces " +
        "stopword pairs, PMI surfaces bound phrases). " +
        "PMI = log2(P(w1w2) / (P(w1)P(w2))) with bigram and unigram " +
        "probabilities over their own occurrence totals. Shape: one " +
        "bigram count + one unigram count (vocab-grain) — the TOTALS " +
        "n1/n2 derive from those count relations (n1 = Σc1, n2 = Σc12 " +
        "pre-filter), never from a corpus re-scan, so the corpus is " +
        "tokenized exactly TWICE (the r7 verdict's 4→2 item; at 100 TB " +
        "the redundant tokenize passes were the operator's dominant " +
        "cost, and the repeated vocab-grain subtrees collapse to one " +
        "execution each via exchange reuse — plan-shape-asserted in " +
        "PlanShapeSpec). The bigram relation joins its two member counts " +
        "(broadcast at any realistic vocab) + two 1-row totals; the " +
        "engine-dependent ln() is pre-rounded at 9dp BEFORE the 6dp " +
        "presentation rounding (the q_lm_perplexity convention — a " +
        "last-ulp libm difference must not flip a .5e-6 boundary); " +
        "ranking uses the rounded pmi with ngram tiebreak so both " +
        "engines order identically; the staged divisions are written " +
        "in the same order in both engines and ln2 is one shared " +
        "double literal.",
      (s, dir) => {
        // par: two tokenize+explode passes over a single-row-group
        // parquet would each run in ONE task without the fan-out guard
        val docs = Tables.par(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
        val uni = docs.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c1"))
        val biAll = docs.select(explode(seqBigrams(col("toks"))).as("ngram"))
          .groupBy("ngram").agg(count(lit(1)).as("c12"))
        val n1df = uni.agg(sum(col("c1")).as("n1"))
        val n2df = biAll.agg(sum(col("c12")).as("n2"))
        val bi = biAll.filter(col("c12") >= PmiMinCount)
        val ratio = (col("c12").cast("double") / col("n2")) /
          ((col("c1a").cast("double") / col("n1")) *
            (col("c1b").cast("double") / col("n1")))
        bi.withColumn("w1", substring_index(col("ngram"), " ", 1))
          .withColumn("w2", substring_index(col("ngram"), " ", -1))
          .join(uni.select(col("tok").as("w1"), col("c1").as("c1a")), "w1")
          .join(uni.select(col("tok").as("w2"), col("c1").as("c1b")), "w2")
          .crossJoin(broadcast(n1df)).crossJoin(broadcast(n2df))
          .select(col("ngram"), col("c12"),
            round(round(log(ratio) / lit(Ln2), 9), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("ngram").asc)
          .limit(25)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |u AS (SELECT unnest(toks) AS tok FROM t),
              |uni AS (SELECT tok, COUNT(*) AS c1 FROM u GROUP BY tok),
              |n1t AS (SELECT sum(c1) AS n1 FROM uni),
              |b AS (SELECT unnest(CASE WHEN len(toks) >= 2
              |    THEN list_transform(range(1, len(toks)), i -> toks[i]||' '||toks[i+1])
              |    ELSE []::VARCHAR[] END) AS ngram FROM t),
              |biall AS (SELECT ngram, COUNT(*) AS c12 FROM b GROUP BY ngram),
              |bi AS (SELECT ngram, c12 FROM biall WHERE c12 >= $PmiMinCount),
              |n2t AS (SELECT sum(c12) AS n2 FROM biall)
              |SELECT ngram, c12,
              |  round(round(ln((c12::DOUBLE / n2) /
              |    ((a.c1::DOUBLE / n1) * (z.c1::DOUBLE / n1))) / $Ln2, 9), 6)
              |    AS pmi
              |FROM bi
              |JOIN uni a ON a.tok = split_part(ngram, ' ', 1)
              |JOIN uni z ON z.tok = split_part(ngram, ' ', 2)
              |CROSS JOIN n1t CROSS JOIN n2t
              |ORDER BY pmi DESC, ngram LIMIT 25""".stripMargin)
    ),

    QueryDef(
      "q_heavy_hitters",
      s"Frequent-terms detection with BOUNDED task memory: every word " +
        s"bigram above 1/$HeavyK of all bigram occurrences, found by a " +
        "mergeable SpaceSaving AGGREGATE (graft.functions.SpaceSavingAgg " +
        "— a TypedImperativeAggregate running the same eviction step as " +
        "the streaming sketch, map-side partial buffers, Misra-Gries " +
        "merge, 2k counters for a proven merged-superset guarantee) " +
        "whose candidate set provably contains every global heavy " +
        "hitter; an exact recount over candidates only (broadcast " +
        "semi-join) makes the output exact, so the oracle is the plain " +
        "exact SQL. Shape: one ordinary partial/final agg over the " +
        "term scan (what crosses the wire is one <= 2k-entry buffer " +
        "per map task — no Dataset object boundary, no separate " +
        "distinct) -> recount scan whose agg shuffle carries only " +
        "candidate keys — the full-vocabulary shuffle of a naive " +
        "groupBy never happens.",
      (s, dir) => {
        // toks MUST be a materialized attribute before entering the
        // higher-order seqBigrams transform (interpreted per element —
        // a composed tokens(text) argument re-tokenizes per position)
        val terms = Tables.par(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .select(explode(seqBigrams(col("toks"))).as("term"))
        val candidates = terms
          .agg(graft.functions.SpaceSavingAgg
            .candidates(col("term"), HeavyK).as("cand"))
          .select(explode(col("cand")).as("term"))
        // Exact denominator without a third exploded pass: bigrams per
        // doc = max(n_tok - 1, 0), one map-only agg over documents.
        val totals = Tables.t(s, dir, "documents")
          .agg(sum(greatest(size(tokens(col("text"))) - 1, lit(0)))
            .cast("long").as("n_terms"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("term").asc)
        terms.join(broadcast(candidates), Seq("term"), "left_semi")
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(totals))
          .filter(col("cnt") * HeavyK > col("n_terms"))
          .withColumn("rank", row_number().over(w))
          .select(col("rank"), col("term"), col("cnt"),
            round(col("cnt").cast("double") / col("n_terms"), 6)
              .as("term_frac"))
          .orderBy("rank")
      },
      // The sketch is output-transparent: plain exact heavy-hitter SQL.
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |b AS (SELECT unnest(list_transform(range(1, len(toks)),
              |    i -> toks[i]||' '||toks[i+1])) AS term
              |  FROM t WHERE len(toks) >= 2),
              |c AS (SELECT term, count(*) AS cnt FROM b GROUP BY 1),
              |n AS (SELECT CAST(sum(CASE WHEN len(toks) >= 2
              |    THEN len(toks)-1 ELSE 0 END) AS BIGINT) AS n_terms FROM t)
              |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, term) AS rank,
              |  term, cnt,
              |  round(CAST(cnt AS DOUBLE)/n_terms, 6) AS term_frac
              |FROM c, n WHERE cnt * $HeavyK > n_terms
              |ORDER BY rank""".stripMargin)
    ),

    QueryDef(
      "q_oov_rate",
      "Tokenizer-vocabulary coverage: induce the top-25 unigram " +
        "vocabulary (count desc, term asc tiebreak), then measure each " +
        "doc's out-of-vocabulary token fraction — the coverage gate a " +
        "tokenizer build runs before committing a vocab. Shape: vocab = " +
        "one term-key agg -> top-V (fixed size, broadcast); corpus = " +
        "map-only explode + broadcast left join + one doc-grain agg. At " +
        "100 TB the vocab side is KBs at any corpus size and the corpus " +
        "never shuffles at token grain — only one row per doc crosses.",
      (s, dir) => {
        val x = Tables.t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .select(col("doc_id"), explode(col("toks")).as("tok"))
        val vocab = x.groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc).limit(25)
          .select(col("tok"), lit(1).as("in_vocab"))
        x.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tok"),
            sum(when(col("in_vocab").isNull, 1).otherwise(0))
              .cast("long").as("n_oov"))
          .select(col("doc_id"), col("n_tok"), col("n_oov"),
            round(col("n_oov").cast("double") / col("n_tok"), 6)
              .as("oov_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |x AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |c AS (SELECT tok, count(*) AS cnt FROM x GROUP BY 1),
              |v AS (SELECT tok, 1 AS in_vocab FROM c
              |  ORDER BY cnt DESC, tok LIMIT 25),
              |j AS (SELECT x.doc_id, count(*) AS n_tok,
              |    CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_oov
              |  FROM x LEFT JOIN v ON x.tok = v.tok GROUP BY 1)
              |SELECT doc_id, n_tok, n_oov,
              |  round(CAST(n_oov AS DOUBLE)/n_tok, 6) AS oov_frac
              |FROM j ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_corpus_filter",
      "The end-to-end training-corpus filter pass, composed from the " +
        "operators above in ONE pipeline: quality gate (>= 2 of the " +
        "q_quality_score points) AND exact-dedup keeper (doc_id = min " +
        "over its 128-bit normalized-text fingerprint group). One scan, " +
        "one fingerprint-key window shuffle — the quality expressions " +
        "ride along for free.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val wFp = Window.partitionBy(md5(normText(col("text"))))
        Tables.t(s, dir, "documents")
          .withColumn("toks", tokens(col("text")))
          .withColumn("n_tok", size(col("toks")))
          .withColumn("n_stop", nStop(col("toks")))
          .withColumn("quality_points",
            qualityPoints(length(col("text")), col("n_tok"), col("n_stop")))
          .withColumn("keeper_id", min(col("doc_id")).over(wFp))
          .filter(col("quality_points") >= 2 &&
            col("keeper_id") === col("doc_id"))
          .select(col("doc_id"), col("lang"), col("n_tok"),
            col("quality_points"))
          .orderBy("doc_id")
      },
      Some {
        val stop = sqlList(stopwords) // the ONE shared list — no oracle drift
        s"""WITH t AS (
           |  SELECT doc_id, lang, text, $toksSql AS toks,
           |    min(doc_id) OVER (PARTITION BY md5($normSql)) AS keeper_id
           |  FROM documents
           |), m AS (
           |  SELECT doc_id, lang, keeper_id, len(toks) AS n_tok,
           |    len(list_filter(toks, x -> list_contains($stop, x))) AS n_stop,
           |    length(text) AS n_chars
           |  FROM t)
           |SELECT doc_id, lang, n_tok,
           |  (CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END
           |   + CASE WHEN n_stop > 0 THEN 1 ELSE 0 END
           |   + CASE WHEN n_chars >= 64 THEN 1 ELSE 0 END) AS quality_points
           |FROM m
           |WHERE (CASE WHEN n_tok >= 10 THEN 1 ELSE 0 END
           |   + CASE WHEN n_stop > 0 THEN 1 ELSE 0 END
           |   + CASE WHEN n_chars >= 64 THEN 1 ELSE 0 END) >= 2
           |  AND keeper_id = doc_id
           |ORDER BY doc_id""".stripMargin
      }
    )
  )
}
