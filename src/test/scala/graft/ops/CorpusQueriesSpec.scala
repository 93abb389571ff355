package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Semantics of the corpus-curation operators on a controlled corpus:
  * the declared queries read `documents.parquet` from a dir, so the spec
  * writes a tiny corpus with known repetition / contamination / PII
  * structure and checks the flags, not just row counts.
  */
class CorpusQueriesSpec extends SparkSpec {
  import spark.implicits._

  // (doc_id, text, lang, source): doc 1 is pathologically repetitive;
  // doc 2 is diverse; doc 3 (src1) is an exact copy of benchmark doc 4
  // (src0); doc 5 carries every PII arm (email, phone, blocklist term).
  private lazy val dir: String = {
    val d = Files.createTempDirectory("corpusspec").toString
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "src1"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src1"),
      (3L, "the quick brown fox jumps over the lazy dog tonight", "en", "src1"),
      (4L, "the quick brown fox jumps over the lazy dog tonight", "en", "src0"),
      (5L, "contact me at bob@example.com or 555-867-5309 dear customer", "en", "src2"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = Registry.queryMap(name)(spark, dir)

  test("q_repetition_filter flags the one-token doc, passes the diverse doc") {
    val rows = run("q_repetition_filter")
      .select("doc_id", "top_word_frac", "dup_2gram_frac", "repetitive")
      .as[(Long, Double, Double, Int)].collect()
      .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    // doc 1: 10x one token -> top frac 1.0, 9 bigram slots / 1 distinct
    assert(rows(1L) == ((1.0, 0.888889, 1))) // round(1 - 1/9, 6)
    // doc 2: all tokens distinct -> nothing repeats
    assert(rows(2L) == ((0.1, 0.0, 0)))
    // doc 3: "the" twice in 10 tokens = 0.2 >= 0.15 -> flagged
    assert(rows(3L)._3 == 1)
  }

  test("q_contamination: exact copy of a benchmark doc has overlap 1.0") {
    val rows = run("q_contamination")
      .select("doc_id", "overlap_frac", "contaminated")
      .as[(Long, Double, Int)].collect()
      .map { case (id, f, c) => id -> ((f, c)) }.toMap
    assert(rows(3L) == ((1.0, 1)))  // verbatim copy of src0 doc 4
    assert(rows(1L) == ((0.0, 0))) // no 3-gram shared with src0
    assert(!rows.contains(4L))     // benchmark docs are not scored
  }

  test("q_tfidf_terms: corpus-wide terms score tf*1, unique terms tf*N") {
    val rows = run("q_tfidf_terms")
      .select("term", "tf", "df", "tfidf")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // "the" appears in docs 3,4,5... no: docs 3 and 4 (twice each) = tf 4, df 2
    val the = rows("the")
    assert(the._2 == 4L && the._3 == 2L && the._4 == 4.0 * (5.0 / 2.0))
    // "spam": tf 10, df 1 -> 10 * 5/1 = 50, the top-scored en term
    assert(rows("spam")._4 == 50.0)
  }

  test("q_domain_mix: small sources keep all docs under the sqrt budget") {
    val rows = run("q_domain_mix")
      .select("source", "n_docs", "sample_cap", "n_kept")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // every source here is far below cap = ceil(4*sqrt(n)) -> all kept
    assert(rows("src1") == (("src1", 3L, 7L, 3L)))
    assert(rows("src0") == (("src0", 1L, 4L, 1L)))
    assert(rows("src2") == (("src2", 1L, 4L, 1L)))
  }

  test("q_pii_scrub counts email + phone + blocklist hits") {
    val rows = run("q_pii_scrub")
      .select("doc_id", "n_redactions", "had_pii")
      .as[(Long, Int, Int)].collect()
      .map { case (id, n, h) => id -> ((n, h)) }.toMap
    assert(rows(5L) == ((3, 1))) // bob@example.com, 555-867-5309, customer
    assert(rows(2L) == ((0, 0)))
  }

  test("q_oov_rate: the highest-frequency doc is fully in-vocab; " +
    "fractions are n_oov/n_tok") {
    val rows = run("q_oov_rate")
      .select("doc_id", "n_tok", "n_oov", "oov_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is "spam" x10 — the single most frequent term, guaranteed
    // inside the top-25 vocab -> zero OOV
    assert(rows(1L) == ((1L, 10L, 0L, 0.0)))
    // every doc: fraction is exactly the integer ratio, 6dp
    rows.values.foreach { case (_, n, oov, frac) =>
      val expect = BigDecimal(oov.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(frac == expect && oov <= n)
    }
    assert(rows.size == 5)
  }

  test("q_lm_perplexity: the train-copy doc scores lowest (head); " +
    "all-unseen docs score exactly log2(V)") {
    val rows = Registry.queryMap("q_lm_perplexity")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("xent"),
          r.getAs[String]("bucket")))).toMap
    // scored slice = non-src0 docs 1,2,3,5 (doc 4 is the train slice)
    assert(rows.keySet == Set(1L, 2L, 3L, 5L))
    // doc 3 is an exact copy of train doc 4: every bigram seen, xent
    // strictly below the unseen floor, lowest overall -> head bucket
    assert(rows(3L)._2 == rows.values.map(_._2).min)
    assert(rows(3L)._3 == "head")
    // docs 1/2/5 share NO tokens with the train slice: every bigram has
    // unseen context, p = 1/V with V = 9 distinct train tokens + 1, so
    // xent == round(round(log2(10), 9), 6) exactly — the Laplace
    // unseen-mass floor, engine-independent by the round-9-then-sum rule
    val unseen = BigDecimal(math.log(10.0) / math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (d <- Seq(1L, 2L, 5L)) assert(rows(d)._2 == unseen, s"doc $d")
    // n_bigrams = tokens - 1 per doc
    assert(rows(1L)._1 == 9 && rows(2L)._1 == 9 && rows(5L)._1 == 11)
  }

  test("q_contamination_sweep: monotone non-increasing in tau, and the " +
    "committed-tau row equals q_contamination's flagged count") {
    val dir = "/root/testdata/sf0.001"
    val sweep = graft.Registry.queryMap("q_contamination_sweep")(spark, dir)
      .as[(Double, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(sweep.map(_._1) == Seq(0.1, 0.2, 0.3, 0.5, 0.8))
    assert(sweep.map(_._2).sliding(2).forall(p => p.head >= p.last),
      s"flagged docs must be monotone non-increasing in tau: $sweep")
    assert(sweep.map(_._3).sliding(2).forall(p => p.head >= p.last))
    val committed = graft.Registry.queryMap("q_contamination")(spark, dir)
      .filter("contaminated = 1").count()
    assert(sweep.find(_._1 == 0.3).get._2 == committed,
      s"sweep@0.3 must equal q_contamination's count $committed")
  }

  test("q_vocab_overlap: hand-computed Jaccard on a planted two-source " +
    "corpus; zero-overlap pairs still emit a row") {
    val d = java.nio.file.Files.createTempDirectory("vocov").toString
    // srcA vocab {aa,bb,cc}, srcB {bb,cc,dd,ee}, srcC {zz} (disjoint)
    Seq((1L, "aa bb cc", "srcA"), (2L, "bb cc dd ee", "srcB"),
      (3L, "zz", "srcC"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.Registry.queryMap("q_vocab_overlap")(spark, d)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(rows == Seq(
      ("srcA", "srcB", 3L, 4L, 2L, 0.4), // |{bb,cc}| / (3+4-2)
      ("srcA", "srcC", 3L, 1L, 0L, 0.0),
      ("srcB", "srcC", 4L, 1L, 0L, 0.0)), rows)
  }
}
