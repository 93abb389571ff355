package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Curation-funnel accounting: every stage exercised on a controlled
  * corpus, first-reason precedence, and the cross-query invariant tying
  * the funnel to the standalone composed filter.
  */
class CorpusFunnelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("funnelspec").toString
    val evalText = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards watch the harvest moon rise tonight"
    val goodText = "the data pipeline reads parquet tables and writes " +
      "bucketed artifacts for every query family in the engine today"
    val docs = Seq(
      // 0_eval_slice: the benchmark docs (src0)
      (1L, evalText, "src0"),
      (2L, "the benchmark second document holds entirely different " +
        "evaluation content for scoring models fairly today", "src0"),
      // 1_quality: 3 tokens, short, no stopwords -> 0 points
      (10L, "tiny bad doc", "src1"),
      // 2_exact_dup: same normalized text as doc 20 (keeper = min id)
      (20L, goodText, "src1"),
      (21L, goodText, "src2"),
      // 3_contaminated: copies the eval text + a short unique tail
      (30L, evalText + " plus small tail", "src3"),
      // 4_kept: clean unique quality docs
      (40L, "the first clean document carries enough tokens and " +
        "characters to clear the quality gate comfortably here", "src3"),
      (41L, "the second clean document also carries plenty of tokens " +
        "and characters to clear every gate easily enough", "src4"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("every stage populated with first-reason precedence") {
    val rows = Registry.queryMap("q_corpus_funnel")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(rows("0_eval_slice")._1 == 2L)
    assert(rows("1_quality")._1 == 1L)
    assert(rows("2_exact_dup")._1 == 1L) // doc 21 (20 is the keeper)
    assert(rows("3_contaminated")._1 == 1L)
    assert(rows("4_kept")._1 == 3L) // 20, 40, 41
    assert(rows.values.map(_._1).sum == 8L)
    assert(math.abs(rows.values.map(_._2).sum - 1.0) < 1e-6)
  }

  test("invariant: kept + contaminated == composed filter's non-src0 pass") {
    val funnel = Registry.queryMap("q_corpus_funnel")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    // q_corpus_filter applies the SAME quality + exact-dup-keeper
    // predicates but neither the eval-slice exclusion nor the
    // contamination stage
    val filtered = Registry.queryMap("q_corpus_filter")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    val srcOf = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val nonSrc0Pass = filtered.count(id => srcOf(id) != "src0")
    assert(funnel.getOrElse("4_kept", 0L) +
      funnel.getOrElse("3_contaminated", 0L) == nonSrc0Pass.toLong)
  }
}
