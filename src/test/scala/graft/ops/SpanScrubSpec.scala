package graft.ops

import graft.{Registry, SparkSpec}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Span-scrub operator (q_dedup_scrub): the rewrite that REMOVES
  * duplicated word-8-gram spans and materializes the cleaned corpus —
  * exact behavior on a controlled corpus, the planted-boilerplate case,
  * native-vs-HOF differentials for the two new expressions, and the two
  * operator invariants (removed_frac==0 iff n_dup_spans==0; re-profiling
  * the scrubbed corpus finds zero duplicated tokens on corpora whose docs
  * are too short to form new cross-kept-piece spans).
  */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("scrubspec").toString
    rows.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // Same corpus shape as SpanDedupSpec: docs 1/2 share their first 9
  // tokens (dup spans at positions 0,1 -> tokens 0..8 covered), doc 3
  // disjoint, doc 4 below the 8-token floor.
  private lazy val dir: String = writeDocs(Seq(
    (1L, "one two three four five six seven eight nine ten", "srcA"),
    (2L, "one two three four five six seven eight nine zzz", "srcB"),
    (3L, "aa bb cc dd ee ff gg hh ii jj", "srcA"),
    (4L, "too short for any span", "srcB")))

  private def scrubRows(d: String): Map[Long, (Long, Long, Double, String)] =
    Registry.queryMap("q_dedup_scrub")(spark, d)
      .as[(Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("scrub removes exactly the tokens covered by duplicated spans") {
    val rows = scrubRows(dir)
    assert(rows(1L) == ((10L, 9L, 0.9, "ten")))
    assert(rows(2L) == ((10L, 9L, 0.9, "zzz")))
    assert(rows(3L) == ((10L, 0L, 0.0, "aa bb cc dd ee ff gg hh ii jj")))
    // below the span floor: untouched, normalized text round-trips
    assert(rows(4L) == ((5L, 0L, 0.0, "too short for any span")))
  }

  test("planted boilerplate prefix is removed, unique tails survive intact") {
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ")
    val d = writeDocs(Seq(
      (1L, s"$boiler u1 u2 u3 u4 u5", "s0"),
      (2L, s"$boiler v1 v2 v3 v4 v5", "s0"),
      (3L, s"$boiler w1 w2 w3 w4 w5", "s1")))
    val rows = scrubRows(d)
    // spans fully inside the 12-token boilerplate (starts 0..4) are shared
    // by all three docs; spans crossing into a tail carry unique tokens and
    // are not duplicated -> exactly the boilerplate is removed.
    assert(rows(1L) == ((17L, 12L, 0.705882, "u1 u2 u3 u4 u5")))
    assert(rows(2L) == ((17L, 12L, 0.705882, "v1 v2 v3 v4 v5")))
    assert(rows(3L) == ((17L, 12L, 0.705882, "w1 w2 w3 w4 w5")))
  }

  test("differential: WordNgramSeq and ScrubTokens match their HOF forms") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val cases = (1 to 60).map { i =>
      val m = rnd.nextInt(20) // 0..19 tokens
      val toks = Seq.fill(m)(vocab(rnd.nextInt(vocab.size)))
      val nStarts = if (m < 8) 0 else rnd.nextInt(4)
      val starts = Seq.fill(nStarts)(rnd.nextInt(m - 7)).sorted
      (i.toLong, toks, starts)
    }
    val df = cases.toDF("id", "toks", "starts")
      .select(col("id"), col("toks"),
        col("starts").cast("array<int>").as("starts"))
    val got = df.select(col("id"),
      TextFunctions.wordNgramSeq(col("toks"), 8).as("g_native"),
      TextFunctions.wordNgramSeqHof(col("toks"), 8).as("g_hof"),
      TextFunctions.scrubTokens(col("toks"), col("starts"), 8).as("s_native"),
      TextFunctions.scrubTokensHof(col("toks"), col("starts"), 8).as("s_hof"))
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[String])]
      .collect()
    got.foreach { case (id, gn, gh, sn, sh) =>
      assert(gn == gh, s"WordNgramSeq mismatch at case $id")
      assert(sn == sh, s"ScrubTokens mismatch at case $id")
    }
  }

  test("artifact phase materializes the cleaned corpus with a report row") {
    val d = writeDocs(Seq(
      (1L, "one two three four five six seven eight nine ten", "srcA"),
      (2L, "one two three four five six seven eight nine zzz", "srcB"),
      (3L, "aa bb cc dd ee ff gg hh ii jj", "srcA")))
    val r = graft.etl.Pipeline.artifactPhase(spark, d,
      graft.etl.Pipeline.ArtifactConfig(scrubTables = Seq("documents")))
    assert(r.size == 1 && r.head.kind == "span_scrub")
    assert(r.head.skippedRows == 18L) // 9 tokens removed from each twin
    val cleaned = spark.read.parquet(s"$d/documents_scrubbed.parquet")
      .as[(Long, String, Long, Long, Double, String)].collect()
      .map(x => x._1 -> ((x._2, x._6))).toMap
    assert(cleaned(1L) == (("srcA", "ten")))
    assert(cleaned(2L) == (("srcB", "zzz")))
    assert(cleaned(3L) == (("srcA", "aa bb cc dd ee ff gg hh ii jj")))
  }

  test("invariants: removed_frac==0 iff n_dup_spans==0; re-profile clean") {
    // Random corpus with genuine 8-gram collisions: a TWO-token vocab makes
    // 8-gram space 2^8=256, so 30 docs of 5..14 tokens collide plentifully.
    // Docs are <= 14 tokens, so any scrubbed doc keeps at most 14-8=6 < 8
    // tokens and the re-profile residual is EXACTLY zero (a kept piece can
    // only form a new span in docs >= 16 tokens).
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb")
    val corpus = (1L to 30L).map { id =>
      val n = 5 + rnd.nextInt(10)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
        s"src${id % 3}")
    }
    val d = writeDocs(corpus)
    val scrub = scrubRows(d)
    val profile = Registry.queryMap("q_dedup_spans")(spark, d)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // q_dedup_spans omits sub-8-token docs; those are never scrubbed.
    scrub.foreach { case (id, (_, nRemoved, _, _)) =>
      val nDup = profile.getOrElse(id, 0L)
      assert((nRemoved == 0L) == (nDup == 0L),
        s"doc $id: n_removed=$nRemoved but n_dup_spans=$nDup")
    }
    assert(scrub.values.exists(_._2 > 0L), "corpus should have dup spans")
    // re-profile: scrub output as a corpus -> zero duplicated spans left
    val scrubbedDocs = corpus.map { case (id, _, src) =>
      (id, scrub(id)._4, src)
    }
    val rescrubDir = writeDocs(scrubbedDocs)
    val docs = spark.read.parquet(s"$rescrubDir/documents.parquet")
    val residual = SpanDedup.duplicatedSpanSet(docs).count()
    assert(residual == 0L, s"re-profile found $residual duplicated spans")
  }
}
