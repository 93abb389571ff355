package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Curation-funnel accounting: every stage (incl. the r13 additions —
  * Gopher any-rule, near-dup non-keeper, per-source token cap)
  * exercised on a controlled corpus, first-reason precedence, and the
  * cross-query invariant tying the funnel's kept row to the composed
  * standalone operators.
  */
class CorpusFunnelSpec extends SparkSpec {
  import spark.implicits._

  /** n-token doc: "the and" + (n-2) unique 5-char words — passes the
    * quality gate (>=10 tokens, stopwords, >=64 chars) and every
    * Gopher rule for n in [20, 80] (mean word length ~4.7 within the
    * published [3, 10] bounds, all-distinct vocabulary, 2 stopwords).
    */
  private def doc(prefix: String, n: Int): String =
    (Seq("the", "and") ++ (1 to n - 2).map(i => f"$prefix$i%02d"))
      .mkString(" ")

  private lazy val evalText = doc("evl", 35)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("funnelspec").toString
    val docs = Seq(
      // 0_eval_slice: the benchmark docs (src0; 35 tokens each)
      (1L, evalText, "src0"),
      (2L, doc("evt", 35), "src0"),
      // 1_quality: 3 tokens, short, no stopwords -> 0 points
      (10L, "tiny bad doc", "src1"),
      // 2_gopher: passes quality (21 tokens, stopword, >=64 chars) but
      // trips the dup-token-ratio rule (nd=2 over nt=21)
      (50L, ("the" +: Seq.fill(20)("data")).mkString(" "), "src1"),
      // 3_exact_dup: identical texts; keeper = min id (qp tie)
      (20L, doc("gdc", 21), "src2"),
      (21L, doc("gdc", 21), "src2"),
      // 4_near_dup: 23 appends 3 tokens to 22's text -> shingle
      // Jaccard ~0.85 (verified pair, NOT an exact dup); keeper 22
      (22L, doc("ndc", 21), "src3"),
      (23L, doc("ndc", 21) + " extratail wordsmore overhere", "src3"),
      // 5_contaminated: copies evalText verbatim + a 30-token unique
      // tail -> word-3-gram overlap ~0.52 >= tau, but shingle Jaccard
      // ~0.47 < the verify threshold (NOT a near-dup of doc 1)
      (31L, evalText + " " + (1 to 30).map(i => f"ctt$i%02d")
        .mkString(" "), "src4"),
      // 6_domain_cap: src5 holds 120 of ~408 corpus tokens; budget =
      // (4*T) div (5*7 sources) = 46, so the quality-rank prefix keeps
      // exactly ONE 40-token doc and the cap drops the other two
      (60L, doc("cpa", 40), "src5"),
      (61L, doc("cpb", 40), "src5"),
      (62L, doc("cpc", 40), "src5"),
      // 7_kept: clean unique quality docs under every gate
      (40L, doc("kpa", 21), "src6"),
      (41L, doc("kpb", 21), "src6"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("every stage populated with first-reason precedence") {
    val rows = Registry.queryMap("q_corpus_funnel")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(rows("0_eval_slice")._1 == 2L, rows)
    assert(rows("1_quality")._1 == 1L, rows)
    assert(rows("2_gopher")._1 == 1L, rows)
    assert(rows("3_exact_dup")._1 == 1L, rows) // 21 (20 is the keeper)
    assert(rows("4_near_dup")._1 == 1L, rows) // 23 (22 is the keeper)
    assert(rows("5_contaminated")._1 == 1L, rows) // 31
    assert(rows("6_domain_cap")._1 == 2L, rows) // two of src5
    assert(rows("7_kept")._1 == 5L, rows) // 20, 22, 40, 41 + one src5
    assert(rows.values.map(_._1).sum == 14L)
    // 8 stage rows each 6dp-rounded -> the sum can be off by up to 4e-6
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("precedence detail: the exact-dup pair is ALSO a verified " +
    "near-dup cluster, but its non-keeper lands in 3_exact_dup") {
    val staged = Registry.queryMap("q_corpus_funnel")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // docs 20/21 are identical -> Jaccard 1.0 -> a verified minhash
    // pair; if near-dup preceded exact-dup the 3_exact_dup row would
    // be empty. This pins the stage ORDER, not just membership.
    assert(staged("3_exact_dup") == 1L && staged("4_near_dup") == 1L)
  }

  test("invariant: 7_kept == the composed standalone operators' " +
    "intersection (the full-pipeline keeper count)") {
    val funnel = Registry.queryMap("q_corpus_funnel")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    // quality + exact-dup keeper: q_corpus_filter's pass set
    val filtered = Registry.queryMap("q_corpus_filter")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    // Gopher any-rule verdicts
    val vAny = GovernanceQueries.docRuleFlags(
        spark.read.parquet(s"$dir/documents.parquet"))
      .select("doc_id", "v_any").as[(Long, Boolean)].collect().toMap
    // near-dup non-keepers: cluster labels x keep-best election
    val keeperOf = Registry.queryMap("q_dedup_keep_best")(spark, dir)
      .select("cluster_id", "keeper_doc").as[(Long, Long)]
      .collect().toMap
    val ndDropped = Registry.queryMap("q_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
      .filter { case (d, c) => keeperOf(c) != d }.map(_._1).toSet
    // contamination verdicts
    val contaminated = Registry.queryMap("q_contamination")(spark, dir)
      .filter("contaminated = 1").select("doc_id").as[Long]
      .collect().toSet
    // per-source cap verdict: q_domain_cap's windows replicated per doc
    val capDropped = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val base = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"),
          size(toks).cast("long").as("n_tok"),
          TextQueries.qualityPoints(length(col("text")), size(toks),
            TextQueries.nStop(toks)).as("qp"))
      val tot = base.agg(sum("n_tok").cast("long").as("total_tok"),
        countDistinct("source").as("n_sources"))
      val wCum = Window.partitionBy("source")
        .orderBy(col("qp").desc, md5(col("doc_id").cast("string")),
          col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.crossJoin(broadcast(tot))
        .withColumn("budget",
          expr(s"(4 * total_tok) div (5 * n_sources)"))
        .withColumn("cum", sum("n_tok").over(wCum))
        .filter(col("cum") > col("budget"))
        .select("doc_id").as[Long].collect().toSet
    }
    val composedKept = srcOf.keySet.count { id =>
      srcOf(id) != "src0" && filtered.contains(id) && !vAny(id) &&
        !ndDropped.contains(id) && !contaminated.contains(id) &&
        !capDropped.contains(id)
    }
    assert(funnel.getOrElse("7_kept", 0L) == composedKept.toLong,
      s"funnel=${funnel.getOrElse("7_kept", 0L)} composed=$composedKept")
  }
}
