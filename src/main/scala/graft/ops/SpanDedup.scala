package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Substring-level (word-span) duplication analysis — the exact-substring
  * dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
  * Language Models Better") approximated at word-n-gram granularity, plus
  * the cross-source contamination matrix built from the same spans.
  *
  * Distinct from the doc-level dedup family (`DedupQueries`): those score
  * whole documents against each other (pairwise Jaccard / MinHash /
  * SimHash); these profile WHICH SPANS of text recur anywhere in the
  * corpus — the signal used to cut boilerplate and templated runs that
  * doc-level dedup leaves behind (a doc that is 20% boilerplate is not a
  * near-dup of anything, but a fifth of its tokens are still duplicated
  * training data).
  *
  * Scale shape (100 TB): one narrow explode (fan-out = tokens/doc), one
  * aggregation keyed on a 32-hex md5 span fingerprint (partial aggs
  * combine map-side; the shuffle carries fingerprints, not text), one
  * equi-join back, one per-doc agg. Nothing is all-pairs. The
  * cross-source matrix aggregates to DISTINCT (source, fingerprint)
  * first, so a span's join fan-out is capped at #sources (low hundreds),
  * never at #documents.
  */
object SpanDedup {

  /** Span width in tokens. 8 balances specificity (random 8-token
    * collisions are ~impossible) against recall on short boilerplate; the
    * published substring threshold is 50 BPE tokens — at 100 TB raise N
    * accordingly, the plan shape is unchanged.
    */
  private val SpanN = 8

  /** A span is "duplicated" when it occurs in at least this many docs. */
  private[ops] val MinDocs = 2

  /** Char-gram width for the character-level substring profile
    * (q_dedup_substrings): 16 chars ≈ 2–3 words — small enough that the
    * winnow guarantee threshold stays near the published 50-token
    * analogue, large enough that random 16-char collisions are
    * ~impossible.
    */
  private val SubstrGram = 16

  /** Winnow window: guarantee = any cross-doc exact repeat of
    * >= SubstrWindow + SubstrGram - 1 chars (47 here) shares a selected
    * fingerprint; expected selected density ~2/(SubstrWindow+1).
    */
  private val SubstrWindow = 32

  /** DuckDB gram-at-position-i builder shared by the span SQL and the
    * scrub oracle (one definition so the two cannot drift).
    */
  private val gramSql: String =
    (0 until SpanN).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
      .mkString("||' '||")

  /** SQL twin of the span fingerprint pipeline: doc_id, source, number of
    * distinct spans in the doc, and one row per distinct span md5.
    */
  private val spanSql: String = {
    val gram = gramSql
    s"""t AS (SELECT doc_id, source, string_split($normSql,' ') AS w FROM documents),
       |g AS (SELECT doc_id, source, list_distinct(list_transform(
       |    range(1, len(w)-${SpanN - 2}), i -> $gram)) AS spans
       |  FROM t WHERE len(w) >= $SpanN),
       |e AS (SELECT doc_id, source, len(spans) AS n_spans,
       |    md5(unnest(spans)) AS sh FROM g)""".stripMargin
  }

  /** One row per (doc, distinct span) for any relation carrying `doc_id`
    * + `text`: doc_id [, passthrough...], n_spans (the doc's
    * distinct-span count), sh (md5 span fingerprint). Spans are distinct
    * per doc (`WordNgrams` dedups), so a plain count over `sh` is a
    * distinct-document count. Stateless per row — usable on a STREAMING
    * input ([[graft.streaming.CorpusStream.boilerplateHits]] probes a
    * batch-built duplicated-span set with this).
    */
  private[graft] def spanRows(docs: DataFrame,
                              passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    docs
      .select(col("doc_id") +: keep :+ tokens(col("text")).as("toks"): _*)
      .filter(size(col("toks")) >= SpanN)
      .select(col("doc_id") +: keep :+
        wordNgrams(col("toks"), SpanN).as("spans"): _*)
      .select(col("doc_id") +: keep :+ size(col("spans")).as("n_spans") :+
        explode(col("spans")).as("span"): _*)
      .select(col("doc_id") +: keep :+ col("n_spans") :+
        md5(col("span")).as("sh"): _*)
  }

  /** Char-winnow twin of [[spanRows]] — one row per (doc, distinct
    * SELECTED char-gram fingerprint): doc_id [, passthrough...], n_spans
    * (the doc's distinct selected count), sh (32-hex winnowed md5 of a
    * char [[SubstrGram]]-gram). The winnow ([[graft.functions
    * .WinnowFingerprints]], O(L) monotonic deque) emits a distinct
    * per-doc set, so a plain count over `sh` is a distinct-document
    * count — the same convention as the word family, which is what lets
    * [[SpanSet]] store BOTH families through one skeleton. The
    * sub-threshold-length filter lives HERE, not at call sites, so every
    * consumer (declared query, pipeline artifact phase, streaming
    * probe) builds/probes the identical population — the r7 band-index
    * tag-population lesson applied structurally.
    */
  private[graft] def winnowRows(docs: DataFrame,
                                passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    docs
      .filter(length(col("text")) - (SubstrGram - 1) >= SubstrWindow)
      .select(col("doc_id") +: keep :+
        graft.functions.WinnowFingerprints(
          col("text"), SubstrGram, SubstrWindow).as("fps"): _*)
      .select(col("doc_id") +: keep :+ size(col("fps")).as("n_spans") :+
        explode(col("fps")).as("sh"): _*)
  }

  /** In-memory duplicated-span set of an UNSTORED corpus: one `sh` per
    * span fingerprint occurring in >= [[MinDocs]] docs. The production
    * path is the STORED artifact ([[SpanSet]] — the bucketed table pair
    * the declared queries and the streaming probe read); this derivation
    * exists for ad-hoc corpora and differential tests, and is the same
    * aggregation [[SpanSet.buildOrLoad]] materializes.
    */
  def duplicatedSpanSet(docs: DataFrame): DataFrame =
    spanRows(docs).groupBy("sh")
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= MinDocs)
      .select("sh")

  /** The stored span artifact for a corpus snapshot dir (built on first
    * touch in a session, reused after): both declared queries read these
    * bucketed tables instead of re-exploding raw text per run.
    */
  private def stored(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    SpanSet.buildOrLoad(s, Tables.par(s, dir, "documents"), SpanSet.tag(dir))

  /** The stored CHAR-winnow artifact for a corpus snapshot dir — the
    * [[SpanSet]] skeleton at character granularity (distinct tag role,
    * so the two families never share a table).
    */
  private def storedChar(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    SpanSet.buildOrLoadChar(s, Tables.par(s, dir, "documents"),
      SpanSet.charTag(dir))

  /** The span-SCRUB rewrite (q_dedup_scrub's body): materialize the
    * cleaned corpus by REMOVING every token covered by a duplicated
    * word-[[SpanN]]-gram span — Lee et al. 2022's actual deduplication
    * step, where the profile queries only measure it. `dupSet` is the
    * duplicated-span fingerprint set to scrub against (the stored
    * [[SpanSet]] for the declared query; any derivation for ad-hoc
    * corpora / the re-profile invariant spec).
    *
    * Output: doc_id, n_tokens, n_removed, removed_frac, scrubbed_text
    * (normalized-token join of the kept positions — token-grain, the
    * same grain the fingerprints are defined at).
    *
    * Shape (100 TB): two corpus scans (positions leg + rewrite leg — a
    * one-scan formulation would have to carry full token arrays through
    * the sh-keyed shuffle, trading a cheap rescan for shuffling the
    * corpus text), one sh-equi-join of the per-position fingerprints
    * against the dup set (bucketed scan side exchange-free), one
    * doc-grain agg that carries ONLY duplicated start positions (ints,
    * not text), one doc_id join back, then a per-doc O(m + |starts|)
    * native rewrite ([[graft.functions.ScrubTokens]]). Nothing
    * all-pairs; no text on any shuffle.
    */
  private[graft] def scrubbed(docs: DataFrame, dupSet: DataFrame,
                              passthrough: Seq[String] = Nil): DataFrame = {
    val keep = passthrough.map(col)
    val toks = docs.select(col("doc_id") +: keep :+
      tokens(col("text")).as("w"): _*)
    val pos = docs
      .select(col("doc_id"),
        posexplode(graft.functions.WordNgramSeq(tokens(col("text")), SpanN)))
      .select(col("doc_id"), col("pos"), md5(col("col")).as("sh"))
    val starts = pos.join(dupSet.select("sh"), Seq("sh"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("ss"))
    toks.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id") +: keep :+ col("w") :+
        graft.functions.ScrubTokens(col("w"),
          coalesce(col("ss"), array().cast("array<int>")), SpanN).as("kept"): _*)
      .select(col("doc_id") +: keep :+
        size(col("w")).cast("long").as("n_tokens") :+
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed") :+
        round((size(col("w")) - size(col("kept"))).cast("double") /
          size(col("w")), 6).as("removed_frac") :+
        array_join(col("kept"), " ").as("scrubbed_text"): _*)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_dedup_spans",
      "Per-document duplicated-span profile: word-8-gram fingerprints " +
        "occurring in >= 2 docs, per-doc duplicated-span count and " +
        "fraction. Both legs read the STORED span artifact (SpanSet: " +
        "rows + counts bucketed on sh, nd precomputed) — the " +
        "fingerprint-keyed shuffle is paid once at build; the read " +
        "path's sh-join is exchange-free off the bucketed scans and the " +
        "only shuffle left is the final doc-grain agg.",
      (s, dir) => {
        val (e, _) = stored(s, dir)
        val dup = SpanSet.duplicatedSpans(s, SpanSet.tag(dir))
          .select(col("sh"), lit(1).as("isdup"))
        e.join(dup, Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(max(col("n_spans")).as("n_spans"),
            count(col("isdup")).as("n_dup_spans"))
          .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
            round(col("n_dup_spans").cast("double") /
              col("n_spans").cast("double"), 6).as("dup_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $spanSql,
              |f AS (SELECT sh FROM e GROUP BY sh HAVING count(*) >= $MinDocs)
              |SELECT e.doc_id, max(e.n_spans) AS n_spans,
              |  count(f.sh) AS n_dup_spans,
              |  round(CAST(count(f.sh) AS DOUBLE)/max(e.n_spans),6) AS dup_frac
              |FROM e LEFT JOIN f USING(sh)
              |GROUP BY e.doc_id ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_dedup_scrub",
      "Span-SCRUB: materialize the CLEANED corpus — every token covered " +
        "by a duplicated word-8-gram span is removed and the kept tokens " +
        "re-joined per doc (Lee et al. 2022's actual dedup step; " +
        "q_dedup_spans only PROFILES the duplication this query removes). " +
        "Emits doc_id, token counts, removed fraction, and the scrubbed " +
        "text itself. The dup-span verdict set is the STORED SpanSet; " +
        "positions come from one per-position fingerprint pass " +
        "(non-distinct native WordNgramSeq — the stored rows are " +
        "distinct-per-doc and so cannot say WHERE a span sits); the " +
        "rewrite is the one-pass native ScrubTokens over sorted dup " +
        "starts. Only integers (doc_id, pos) ride the doc-grain " +
        "shuffle — never text. Invariants (SpanScrubSpec): removed_frac " +
        "== 0 exactly when q_dedup_spans' n_dup_spans == 0, and " +
        "re-profiling the scrubbed corpus finds (near-)zero duplicated " +
        "tokens.",
      (s, dir) => {
        stored(s, dir) // ensure the span artifact exists for this corpus
        scrubbed(Tables.par(s, dir, "documents"),
          SpanSet.duplicatedSpans(s, SpanSet.tag(dir)))
          .orderBy("doc_id")
      },
      Some(s"""WITH $spanSql,
              |f AS (SELECT sh FROM e GROUP BY sh HAVING count(*) >= $MinDocs),
              |ph AS (SELECT doc_id, unnest(range(1, len(w)-${SpanN - 2})) AS i,
              |    w FROM t WHERE len(w) >= $SpanN),
              |ph2 AS (SELECT doc_id, i, md5($gramSql) AS sh FROM ph),
              |st AS (SELECT doc_id, list(i ORDER BY i) AS ss
              |  FROM ph2 JOIN f USING(sh) GROUP BY doc_id),
              |r AS (SELECT t.doc_id, t.w, coalesce(st.ss, CAST([] AS BIGINT[]))
              |    AS ss FROM t LEFT JOIN st USING(doc_id)),
              |k AS (SELECT doc_id, len(w) AS nt, list_transform(list_filter(
              |    range(1, len(w)+1),
              |    p -> len(list_filter(ss, s -> s >= p - ${SpanN - 1} AND s <= p)) = 0),
              |    p -> w[p]) AS kept FROM r)
              |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens,
              |  CAST(nt - len(kept) AS BIGINT) AS n_removed,
              |  round(CAST(nt - len(kept) AS DOUBLE) / nt, 6) AS removed_frac,
              |  coalesce(array_to_string(kept, ' '), '') AS scrubbed_text
              |FROM k ORDER BY doc_id""".stripMargin)
    ),

    QueryDef(
      "q_source_overlap",
      "Cross-source contamination matrix: for each source pair, how many " +
        "distinct word-8-gram spans they share. No self-join: collect " +
        "each span's source SET (bounded by the #sources dimension, a " +
        "small constant — NOT a doc list) in one agg, then explode the " +
        "ordered pairs — a hot span present everywhere materializes " +
        "once, not #sources² join rows. Reads the stored sh-bucketed " +
        "span rows, so the per-span source-set agg is exchange-free.",
      (s, dir) => {
        stored(s, dir)._1
          .groupBy("sh")
          .agg(sort_array(collect_set(col("source"))).as("srcs"))
          .filter(size(col("srcs")) >= 2)
          .select(explode(flatten(transform(col("srcs"), (x, i) =>
            transform(
              slice(col("srcs"), i + lit(2), size(col("srcs")) - i - lit(1)),
              y => struct(x.as("source_a"), y.as("source_b"))))))
            .as("pair"))
          .select(col("pair.source_a"), col("pair.source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_shared_spans"))
          .orderBy("source_a", "source_b")
      },
      Some(s"""WITH $spanSql,
              |d AS (SELECT DISTINCT source, sh FROM e)
              |SELECT a.source AS source_a, b.source AS source_b,
              |  count(*) AS n_shared_spans
              |FROM d a JOIN d b ON a.sh = b.sh AND a.source < b.source
              |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)
    ),

    QueryDef(
      "q_dedup_substrings",
      "CHARACTER-level exact-substring duplication profile (r7 verdict " +
        "#6 — the genuine Lee et al. 2022 granularity the word-8-gram " +
        "span profile approximates), alignment-free via winnowing " +
        s"(Schleimer et al. 2003, MOSS): every char $SubstrGram-gram is " +
        s"md5-fingerprinted, each sliding window of $SubstrWindow " +
        "consecutive gram hashes SELECTS its minimum value, and the " +
        "per-doc distinct selected set is counted against the corpus. " +
        "Content-defined selection means two copies of a substring " +
        "select the SAME fingerprints whatever their byte offsets — " +
        "GUARANTEED detection of any cross-doc exact repeat >= " +
        s"${SubstrWindow + SubstrGram - 1} chars (a window of " +
        s"$SubstrWindow gram positions fits inside the shared run), at " +
        s"~2/(W+1) ≈ ${200 / (SubstrWindow + 1)}% the density of " +
        "all-positions fingerprinting. Emits per-doc selected/duplicated " +
        "counts + ratio — same shape as the word-span profile, so the " +
        "two operating points are directly comparable (SCALE.md §3). " +
        "Scale: the winnow is the native O(L) monotonic-deque Expression " +
        "(functions/WinnowExpr.scala) — one md5 per gram position, " +
        "amortized O(1) per window — run ONCE at artifact build: the " +
        "selected relation is a STORED SpanSet family (charspans role, " +
        "sh-bucketed rows + counts, delta-exact appends), so the read " +
        "path is an exchange-free co-bucketed join and the only build " +
        "shuffle carries ~2L/(W+1) 32-hex keys per doc, never text; " +
        "docs shorter than " +
        "the guarantee threshold are excluded (their whole-doc dups are " +
        "H1's exact-hash job). Within-doc repeats are intentionally NOT " +
        "counted (distinct-per-doc fingerprints; H4a owns intra-doc " +
        "repetition).",
      (s, dir) => {
        // Reads the STORED char-winnow artifact exactly as q_dedup_spans
        // reads the word one: rows ⋈ duplicated-set is an exchange-free
        // sort-merge of two sh-co-bucketed scans; the winnow itself (the
        // native O(L) deque expression — the HOF formulation is O(L·W)
        // after CollapseProject inlining, measured ~100× at sf0.01) runs
        // ONCE at build, never per query.
        val (e, _) = storedChar(s, dir)
        val dup = SpanSet.duplicatedSpans(s, SpanSet.charTag(dir))
          .select(col("sh"), lit(1).as("isdup"))
        e.join(dup, Seq("sh"), "left")
          .groupBy("doc_id")
          .agg(max(col("n_spans")).cast("long").as("n_sel"),
            count(col("isdup")).as("n_dup"))
          .select(col("doc_id"), col("n_sel"), col("n_dup"),
            round(col("n_dup").cast("double") / col("n_sel"), 6)
              .as("dup_ratio"))
          .orderBy("doc_id")
      },
      Some {
        val w1 = SubstrWindow - 1
        s"""WITH kd AS (SELECT doc_id, text,
           |    length(text) - ${SubstrGram - 1} AS le FROM documents
           |  WHERE length(text) - ${SubstrGram - 1} >= $SubstrWindow),
           |kg AS (SELECT doc_id, list_transform(range(1, le + 1),
           |    i -> md5(substr(text, i, $SubstrGram))) AS hs, le FROM kd),
           |ks AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |    range($SubstrWindow, le + 1),
           |    j -> list_min(hs[j - $w1:j])))) AS fp FROM kg),
           |kc AS (SELECT fp, count(*) AS n_docs FROM ks GROUP BY fp)
           |SELECT ks.doc_id, count(*) AS n_sel,
           |  CAST(sum(CASE WHEN kc.n_docs >= $MinDocs THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_dup,
           |  round(CAST(sum(CASE WHEN kc.n_docs >= $MinDocs THEN 1 ELSE 0 END)
           |    AS DOUBLE) / count(*), 6) AS dup_ratio
           |FROM ks JOIN kc USING (fp)
           |GROUP BY ks.doc_id ORDER BY doc_id""".stripMargin
      }
    )
  )
}
