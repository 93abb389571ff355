package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-selection and corpus-statistics operators (SURVEY.md §2 H4k/H4l):
  * targeted data selection via hashed-n-gram importance weights (the DSIR
  * recipe — Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"), and the two classical corpus-scaling profiles
  * a data card reports: Heaps'-law vocabulary growth and the Zipf
  * rank-frequency curve (Heaps 1978; Zipf 1949 — both public-domain
  * formulations).
  *
  * Determinism: the CorpusQueries convention — ratios are single IEEE
  * divisions of exact-integer-valued doubles, every `ln` is rounded to 9
  * decimals BEFORE any summation (so a last-ulp libm difference between
  * engines cannot reach a sum), and weight sums are exact DECIMAL.
  */
object SelectionQueries {

  /** DSIR feature-hash bucket count. Small enough that the bucket
    * relation always broadcasts; large enough that collisions do not
    * flatten the weight signal on the test vocabulary (~1.6k distinct
    * bigrams at sf0.01). The paper uses 10^4 buckets at web scale — the
    * knob, not the shape.
    */
  private[graft] val DsirBuckets = 512

  /** Seed predicate: the target distribution is "docs that mention this
    * token" — a content seed, so the learned weights are genuinely
    * discriminative (the lang column of the synthetic corpus is
    * uncorrelated with text, which would make a lang seed a no-signal
    * target; LangIdMeasuredSpec documents that property).
    */
  private[graft] val DsirSeedToken = "stream"

  private[graft] val DsirTopK = 100

  /** Hashed feature bucket of a word bigram: md5 prefix (portable across
    * both engines) reduced mod [[DsirBuckets]].
    */
  private[graft] def featBucket(g: Column): Column =
    conv(substring(md5(g), 1, 6), 16, 10).cast("long") % DsirBuckets

  private def featBucketSql(g: String): String =
    s"CAST(('0x' || substr(md5($g), 1, 6)) AS BIGINT) % $DsirBuckets"

  /** Per-bucket log importance weight λ_b = ln( p_target(b) / p_raw(b) )
    * with Laplace smoothing, rounded 9dp (the engine-neutralization
    * point). Both legs are single IEEE divisions of exact-integer-valued
    * doubles.
    */
  private[graft] def lambda(tb: Column, ttot: Column, qb: Column,
                            qtot: Column): Column =
    round(log(
      ((tb + lit(1L)).cast("double") / (ttot + lit(DsirBuckets.toLong)).cast("double")) /
        ((qb + lit(1L)).cast("double") / (qtot + lit(DsirBuckets.toLong)).cast("double"))), 9)

  /** DuckDB bigram-occurrence unnest — the q_lm_perplexity idiom, shared
    * here so the two modules' oracles cannot drift on the gram stream.
    */
  private val bigramsSql: String =
    "CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)), " +
      "i -> toks[i]||' '||toks[i+1]) ELSE []::VARCHAR[] END"

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------------------------- H4k
    QueryDef(
      "q_dsir_sample",
      "DSIR targeted data selection (Xie et al. 2023): estimate hashed " +
        s"bigram bucket distributions for a seed slice (docs containing " +
        s"'$DsirSeedToken') and the raw corpus, score every doc by its " +
        "summed per-occurrence log importance ratio, and keep the top " +
        s"$DsirTopK by length-normalized weight — the docs most like the " +
        "seed set. Shape: TWO corpus explode passes BY DESIGN (the " +
        "q_dedup_scrub convention — at corpus scale re-scanning beats " +
        "materializing a gram-grain intermediate, which is " +
        "corpus-sized): pass 1 feeds the bucket counts (map-side " +
        s"partial into $DsirBuckets groups — no corpus-grain shuffle), " +
        "pass 2 probes the broadcast λ table and ends in the per-doc " +
        "agg, the only corpus-grain shuffle. Bucket tables are " +
        s"$DsirBuckets rows (broadcast both ways), totals via a 1-row " +
        "cross join. λ_b is ln() of smoothed count ratios " +
        "rounded 9dp per bucket BEFORE the exact DECIMAL per-doc sum; " +
        "docs with <2 tokens have no bigrams and are absent (the " +
        "lmScore convention). At 100 TB nothing changes: bucket count " +
        "is a constant, the heavy legs are the two explode passes + " +
        "one doc-keyed agg.",
      (s, dir) => {
        val toksD = Tables.par(s, dir, "documents")
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .withColumn("seed",
            array_contains(col("toks"), lit(DsirSeedToken)))
        val occ = toksD
          .select(col("doc_id"), col("seed"),
            explode(TextQueries.seqBigrams(col("toks"))).as("g"))
          .withColumn("b", featBucket(col("g")))
        val bc = occ.groupBy("b").agg(
          count(lit(1)).as("qb"),
          sum(when(col("seed"), 1L).otherwise(0L)).as("tb"))
        val tot = bc.agg(sum(col("qb")).as("qtot"), sum(col("tb")).as("ttot"))
        val lam = bc.crossJoin(broadcast(tot))
          .select(col("b"),
            lambda(col("tb"), col("ttot"), col("qb"), col("qtot")).as("lam"))
        occ.join(broadcast(lam), Seq("b"))
          .groupBy("doc_id", "seed")
          .agg(count(lit(1)).as("n_grams"),
            sum(col("lam").cast(DecimalType(28, 9))).as("wsum"))
          .select(col("doc_id"), col("seed").cast("int").as("is_seed"),
            col("n_grams"),
            round(col("wsum").cast("double"), 6).as("logw_sum"),
            round(col("wsum").cast("double") / col("n_grams"), 6)
              .as("logw_avg"))
          .orderBy(col("logw_avg").desc, col("doc_id"))
          .limit(DsirTopK)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sd AS (SELECT doc_id, toks,
              |    list_contains(toks, '$DsirSeedToken') AS seed FROM t),
              |occ AS (SELECT doc_id, seed,
              |    ${featBucketSql("g")} AS b
              |  FROM (SELECT doc_id, seed, unnest($bigramsSql) AS g FROM sd)),
              |bc AS (SELECT b, COUNT(*) AS qb,
              |    CAST(SUM(CASE WHEN seed THEN 1 ELSE 0 END) AS BIGINT) AS tb
              |  FROM occ GROUP BY b),
              |tot AS (SELECT CAST(SUM(qb) AS BIGINT) AS qtot,
              |    CAST(SUM(tb) AS BIGINT) AS ttot FROM bc),
              |lam AS (SELECT b,
              |    round(ln(((tb + 1)::DOUBLE / (ttot + $DsirBuckets)::DOUBLE) /
              |      ((qb + 1)::DOUBLE / (qtot + $DsirBuckets)::DOUBLE)), 9) AS lam
              |  FROM bc CROSS JOIN tot),
              |d AS (SELECT doc_id, CAST(seed AS INT) AS is_seed,
              |    COUNT(*) AS n_grams,
              |    round(CAST(SUM(CAST(lam AS DECIMAL(28,9))) AS DOUBLE), 6)
              |      AS logw_sum,
              |    round(CAST(SUM(CAST(lam AS DECIMAL(28,9))) AS DOUBLE)
              |      / COUNT(*), 6) AS logw_avg
              |  FROM occ JOIN lam USING (b) GROUP BY doc_id, seed)
              |SELECT * FROM d
              |ORDER BY logw_avg DESC, doc_id LIMIT $DsirTopK""".stripMargin)
    ),

    // --------------------------------------------------------------- H4l
    QueryDef(
      "q_heaps_law",
      "Heaps'-law vocabulary-growth curve: at 8 corpus prefixes (doc_id " +
        "octiles), cumulative token occurrences vs distinct vocabulary, " +
        "for unigrams AND bigrams, plus the incremental log-log growth " +
        "exponent between consecutive octiles (β in V ≈ K·N^β — the " +
        "number a tokenizer-budget plan reads). Shape: vocabulary is " +
        "NOT recounted per prefix — each gram's FIRST doc_id is computed " +
        "once (one gram-grain agg, the q_vocab_ngrams shuffle) and every " +
        "octile's vocab is a conditional count over first-seen octile; " +
        "token sums fuse into one doc-grain pass. Both passes broadcast " +
        "the 1-row max-doc relation; the final 16-row unpivot + lag " +
        "window is driver-trivial. ln() rounded 9dp per row; the β " +
        "ratio is one IEEE division rounded 6dp.",
      (s, dir) => {
        val octs = 1 to 8
        val docs = Tables.t(s, dir, "documents")
        val toksD = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
        val mx = docs.agg((max(col("doc_id")) + lit(1L)).as("nid"))
        def cut(i: Int) = expr(s"(nid * $i) div 8")
        // doc-grain: cumulative occurrence counts at each cutoff, fused
        val perDoc = toksD.select(col("doc_id"),
          size(col("toks")).cast("long").as("o1"),
          size(TextQueries.seqBigrams(col("toks"))).cast("long").as("o2"))
        val docAggs = octs.flatMap(i => Seq(
          sum(when(col("doc_id") < cut(i), col("o1")).otherwise(0L))
            .as(s"t1_$i"),
          sum(when(col("doc_id") < cut(i), col("o2")).otherwise(0L))
            .as(s"t2_$i"))) ++
          octs.map(i => max(cut(i)).as(s"c_$i"))
        val da = perDoc.crossJoin(broadcast(mx))
          .agg(docAggs.head, docAggs.tail: _*)
        // gram-grain: first-seen doc per gram, then conditional counts
        val occAll = toksD
          .select(col("doc_id"), lit(1).as("n"), explode(col("toks")).as("g"))
          .unionAll(toksD.select(col("doc_id"), lit(2).as("n"),
            explode(TextQueries.seqBigrams(col("toks"))).as("g")))
        val vocAggs = octs.map(i =>
          sum(when(col("fd") < cut(i), 1L).otherwise(0L)).as(s"v_$i"))
        val va = occAll.groupBy("n", "g").agg(min(col("doc_id")).as("fd"))
          .crossJoin(broadcast(mx))
          .groupBy("n").agg(vocAggs.head, vocAggs.tail: _*)
        val rows = octs.map(i => struct(lit(i).as("octile"),
          col(s"c_$i").as("cutoff"),
          when(col("n") === 1, col(s"t1_$i")).otherwise(col(s"t2_$i"))
            .as("n_occurrences"),
          col(s"v_$i").as("vocab")))
        val w = Window.partitionBy(col("n")).orderBy(col("octile"))
        def ln9(c: Column) = when(c > 0, round(log(c), 9))
        val lt = ln9(col("n_occurrences"))
        val lv = ln9(col("vocab"))
        va.crossJoin(broadcast(da))
          .select(col("n"), explode(array(rows: _*)).as("r"))
          .select(col("n"), col("r.*"))
          .withColumn("beta_incr",
            round((lv - lag(lv, 1).over(w)) /
              nullif(lt - lag(lt, 1).over(w), lit(0.0)), 6))
          .orderBy("n", "octile")
      },
      Some {
        val octs = 1 to 8
        val cuts = octs.map(i => s"(nid * $i) // 8")
        val docSums = octs.flatMap(i => Seq(
          s"CAST(SUM(CASE WHEN doc_id < ${cuts(i - 1)} THEN o1 ELSE 0 END) AS BIGINT) AS t1_$i",
          s"CAST(SUM(CASE WHEN doc_id < ${cuts(i - 1)} THEN o2 ELSE 0 END) AS BIGINT) AS t2_$i")) ++
          octs.map(i => s"MAX(${cuts(i - 1)}) AS c_$i")
        val vocSums = octs.map(i =>
          s"CAST(SUM(CASE WHEN fd < ${cuts(i - 1)} THEN 1 ELSE 0 END) AS BIGINT) AS v_$i")
        val unpiv = octs.map(i =>
          s"SELECT n, $i AS octile, c_$i AS cutoff, " +
            s"CASE WHEN n = 1 THEN t1_$i ELSE t2_$i END AS n_occurrences, " +
            s"v_$i AS vocab FROM j").mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |mx AS (SELECT MAX(doc_id) + 1 AS nid FROM documents),
           |pd AS (SELECT doc_id, len(toks) AS o1,
           |    CASE WHEN len(toks) >= 2 THEN len(toks) - 1 ELSE 0 END AS o2
           |  FROM t),
           |da AS (SELECT ${docSums.mkString(", ")} FROM pd CROSS JOIN mx),
           |occ AS (SELECT doc_id, 1 AS n, unnest(toks) AS g FROM t
           |  UNION ALL
           |  SELECT doc_id, 2 AS n, unnest($bigramsSql) AS g FROM t),
           |fs AS (SELECT n, g, MIN(doc_id) AS fd FROM occ GROUP BY n, g),
           |va AS (SELECT n, ${vocSums.mkString(", ")}
           |  FROM fs CROSS JOIN mx GROUP BY n),
           |j AS (SELECT * FROM va CROSS JOIN da),
           |u AS ($unpiv),
           |l AS (SELECT *,
           |    CASE WHEN n_occurrences > 0 THEN round(ln(n_occurrences), 9) END AS lt,
           |    CASE WHEN vocab > 0 THEN round(ln(vocab), 9) END AS lv
           |  FROM u)
           |SELECT n, octile, cutoff, n_occurrences, vocab,
           |  round((lv - lag(lv, 1) OVER w) /
           |    nullif(lt - lag(lt, 1) OVER w, 0.0), 6) AS beta_incr
           |FROM l WINDOW w AS (PARTITION BY n ORDER BY octile)
           |ORDER BY n, octile""".stripMargin
      }
    ),

    // --------------------------------------------------------------- H4l'
    QueryDef(
      "q_zipf_curve",
      "Zipf rank-frequency profile: the top-64 unigram terms by corpus " +
        "frequency with their rank, ln(count), and the incremental " +
        "log-log slope between consecutive ranks (Zipf's s in f ∝ " +
        "r^-s) — the data-card curve that says whether a corpus has " +
        "natural-language frequency structure or is template spam. " +
        "Shape: one explode + vocab-grain count, then a distributed " +
        "TakeOrdered top-K (NO global window over the vocabulary — at " +
        "100 TB the vocab is 10^8+ and a full-rank window would " +
        "single-partition it; ranking happens on the 64 survivors). " +
        "ln() rounded 9dp per row; slope one IEEE division rounded 6dp.",
      (s, dir) => {
        val k = 64
        val top = Tables.t(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term"))
          .limit(k)
        // rank window runs on the k-row survivor set only (bounded).
        val w = Window.orderBy(col("cnt").desc, col("term"))
        val lc = round(log(col("cnt")), 9)
        val lr = round(log(col("rank")), 9)
        top
          .withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("log_cnt", lc)
          .withColumn("slope_incr",
            round((lc - lag(lc, 1).over(w)) /
              (lr - round(log(lag(col("rank"), 1).over(w)), 9)), 6))
          .select("rank", "term", "cnt", "log_cnt", "slope_incr")
          .orderBy("rank")
      },
      Some("""WITH c AS (SELECT term, COUNT(*) AS cnt FROM
             |    (SELECT unnest(TOKS) AS term FROM documents) GROUP BY term),
             |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term LIMIT 64),
             |r AS (SELECT term, cnt,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
             |  FROM top)
             |SELECT rank, term, cnt, round(ln(cnt), 9) AS log_cnt,
             |  round((round(ln(cnt), 9) -
             |      lag(round(ln(cnt), 9), 1) OVER w) /
             |    (round(ln(rank), 9) -
             |      round(ln(lag(rank, 1) OVER w), 9)), 6) AS slope_incr
             |FROM r WINDOW w AS (ORDER BY rank)
             |ORDER BY rank""".stripMargin.replace("TOKS", toksSql))
    )
  )
}
