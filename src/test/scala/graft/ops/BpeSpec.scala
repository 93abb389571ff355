package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** q_bpe_merges — the semantics that must hold regardless of corpus:
  * frequency-weighted pair counting at vocabulary grain, lexicographic
  * argmax tiebreak, and GREEDY NON-OVERLAPPING merge application (the
  * run-parity rule: "aaaa" under (a,a) becomes (aa)(aa), "aaa" becomes
  * (aa)(a)).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Write a doc-per-string corpus and run the declared query. */
  private def merges(docs: String*): Seq[(Int, String, String, Long)] = {
    val dir = Files.createTempDirectory("graft-bpe").toString
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t, "s0") }
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    Registry.queryMap("q_bpe_merges")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
  }

  test("weighted counts + lexicographic tiebreak pick the first merge") {
    // "ab" x3 docs, "cd" x1: pair (a,b) weight 3 beats (c,d) weight 1
    val m = merges("ab", "ab", "ab", "cd")
    assert(m.head == ((1, "a", "b", 3L)), m.head)
  }

  test("greedy non-overlap: aaaa counts 3 pre-merge pairs but merges " +
    "to (aa)(aa); aaa merges to (aa)(a)") {
    // single doc "aaaa aaa": vocab {aaaa:1, aaa:1}; (a,a) weight 3+2=5
    val m = merges("aaaa aaa")
    assert(m.head == ((1, "a", "a", 5L)), m.head)
    // round 2 state: aaaa->[aa,aa], aaa->[aa,a]; pairs (aa,aa):1, (aa,a):1
    // -> lexicographic tiebreak picks (aa,a)
    assert(m(1) == ((2, "aa", "a", 1L)), m(1))
    // round 3: aaaa->[aa,aa] still; aaa->[aaa]; only (aa,aa):1 remains
    assert(m(2) == ((3, "aa", "aa", 1L)), m(2))
  }

  test("merges chain into longer subwords in frequency order") {
    // the/them/they, each x3: (h,e) and (t,h) tie at weight 9 -> the
    // lexicographic lhs tiebreak picks (h,e); round 2 then finds the
    // chained (t,he) at weight 9 over (he,m)/(he,y) at 3
    val m = merges("the them they the them they the them they")
    assert(m.take(2).map(x => (x._2, x._3)) == Seq(("h", "e"), ("t", "he")))
    // every emitted rank is consecutive from 1 and counts are positive
    assert(m.map(_._1) == (1 to m.size).toSeq)
    assert(m.forall(_._4 > 0))
  }

  test("q_bpe_encode: fully-mergeable corpus compresses each word to " +
    "one symbol; metrics are mutually consistent") {
    val dir = Files.createTempDirectory("graft-bpe-enc").toString
    // vocab {ab:2, abab:1}: merges (a,b) then (ab,ab); after both,
    // every word is a single symbol, so the corpus-weighted symbol
    // count equals the 3 word occurrences; subword vocab = {ab, abab}
    Seq((0L, "ab abab ab", "s0")).toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val m = Registry.queryMap("q_bpe_encode")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_words") == 2.0)
    assert(m("chars_total") == 2 * 2 + 4.0) // ab x2 + abab
    assert(m("syms_total") == 3.0) // three occurrences, one symbol each
    assert(m("subword_vocab") == 2.0) // {ab, abab}
    assert(m("compression_x") ==
      math.rint(8.0 / 3.0 * 1e6) / 1e6)
  }

  test("invariants hold at production-shaped merge counts: argmax pair " +
    "counts monotone non-increasing, total symbols strictly decreasing " +
    "(BpeScale runs the same loop to 500+; this keeps the invariant " +
    "check in the always-green suite at a fast round count)") {
    val dir = Files.createTempDirectory("graft-bpe-scale").toString
    // Deterministic Zipf-ish corpus with enough merge capacity to
    // sustain >100 rounds: 60 distinct 8-char words over a 5-letter
    // alphabet, word w repeated (61-w) times.
    val abc = "abcde"
    val words = (0 until 60).map { w =>
      val sb = new StringBuilder
      var x = w * 2654435761L & 0x7fffffffL
      (0 until 8).foreach { _ =>
        sb.append(abc((x % 5).toInt)); x = (x * 48271) % 2147483647L
      }
      sb.toString
    }
    val text = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(60 - i)(w) }.mkString(" ")
    Seq((0L, text, "s0")).toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val counts = scala.collection.mutable.Buffer.empty[Long]
    val syms = scala.collection.mutable.Buffer.empty[Long]
    val (ms, vFinal) = BpeQueries.learnAndApply(spark, dir, 120,
      (rank, _, v) =>
        if (rank % 30 == 0)
          syms += v.selectExpr("sum(cnt * size(syms))").head().getLong(0))
    try {
      ms.foreach(m => counts += m._4)
      assert(ms.length >= 100, s"expected >=100 merges, got ${ms.length}")
      assert(counts.sliding(2).forall(p => p.head >= p.last),
        s"pair counts not monotone: $counts")
      assert(syms.length >= 3 &&
        syms.sliding(2).forall(p => p.last < p.head),
        s"syms_total not strictly decreasing: $syms")
    } finally { vFinal.unpersist(); Checkpoints.free(vFinal) }
  }

  test("q_bpe_tokenize: per-doc token counts match the hand-derived " +
    "segmentation and sum to q_bpe_encode's corpus totals") {
    val dir = Files.createTempDirectory("graft-bpe-tok").toString
    // vocab {ab:3, cd:1}: merges (a,b,3) then (c,d,1) -> both words
    // become single tokens. doc 0 = "ab ab", doc 1 = "ab cd".
    Seq((0L, "ab ab", "s0"), (1L, "ab cd", "s0"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queryMap("q_bpe_tokenize")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(rows(0L) == ((2L, 4L, 2L, 2.0)), rows(0L))
    assert(rows(1L) == ((2L, 4L, 2L, 2.0)), rows(1L))
    // corpus totals tie the two consumers of the shared learned state
    val enc = Registry.queryMap("q_bpe_encode")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.values.map(_._2).sum.toDouble == enc("chars_total"))
    assert(rows.values.map(_._3).sum.toDouble == enc("syms_total"))
  }

  test("q_bpe_fertility: a language whose words exhaust the merge " +
    "budget shows fertility > 1 while a fully-merged language sits at " +
    "exactly 1.0; per-lang totals sum to the corpus totals") {
    val dir = Files.createTempDirectory("graft-bpe-fert").toString
    // en: "aa" x3 merges to one symbol in round 1 -> fertility 1.0.
    // de: two 8-char all-distinct words need 7 merges EACH; after the
    // en merge only 9 rounds remain < 14 needed -> at least one de
    // word stays multi-symbol -> fertility > 1.
    Seq((0L, "aa aa aa", "en", "s0"),
      (1L, "zyxwvuts ponmlkji", "de", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Registry.queryMap("q_bpe_fertility")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    val en = rows("en")
    assert(en == ((1L, 3L, 6L, 3L, 1.0, 2.0)), en)
    val de = rows("de")
    assert(de._1 == 1L && de._2 == 2L && de._3 == 16L, de)
    assert(de._5 > 1.0, s"de words cannot fully merge in 10 rounds: $de")
    // cross-face consistency with the encode totals
    val enc = Registry.queryMap("q_bpe_encode")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert((en._3 + de._3).toDouble == enc("chars_total"))
    assert((en._4 + de._4).toDouble == enc("syms_total"))
  }
}
