package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Semantics of the span-level (word-8-gram) duplication operators on a
  * controlled corpus with known shared-substring structure.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 10-token docs -> 3 distinct 8-gram spans each (positions 1..3).
  // doc 1 / doc 2: identical first 9 tokens, different last token ->
  //   spans 1..2 shared, span 3 unique to each.
  // doc 3: disjoint vocabulary -> no shared spans.
  // doc 4: only 5 tokens -> below the 8-token floor, excluded.
  // Sources: docs 1,3 in srcA; doc 2 in srcB -> exactly one overlapping
  //   source pair (srcA, srcB) sharing 2 spans.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("spanspec").toString
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten", "en", "srcA"),
      (2L, "one two three four five six seven eight nine zzz", "en", "srcB"),
      (3L, "aa bb cc dd ee ff gg hh ii jj", "en", "srcA"),
      (4L, "too short for any span", "en", "srcB"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = Registry.queryMap(name)(spark, dir)

  test("q_dedup_spans counts shared spans per doc; disjoint doc scores 0") {
    val rows = run("q_dedup_spans")
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) == ((3, 2L, 0.666667))) // spans at pos 1,2 shared with doc 2
    assert(rows(2L) == ((3, 2L, 0.666667)))
    assert(rows(3L) == ((3, 0L, 0.0)))      // disjoint vocabulary
    assert(!rows.contains(4L))              // < 8 tokens -> no spans
  }

  test("q_source_overlap reports the one sharing pair with its span count") {
    val rows = run("q_source_overlap")
      .as[(String, String, Long)].collect().toSeq
    assert(rows == Seq(("srcA", "srcB", 2L)))
  }

  test("span fingerprinting dedups repeats WITHIN a doc (no self-dup)") {
    val d = Files.createTempDirectory("spanspec2").toString
    // the same 8-gram occurs twice inside one doc; no other doc has it
    Seq((1L, "a b c d e f g h a b c d e f g h", "en", "srcA"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_dedup_spans")(spark, d)
      .as[(Long, Int, Long, Double)].collect()
    // 16 tokens -> 9 span positions but "a b c d e f g h" repeats; the
    // distinct-span contract means NONE count as duplicated (1 doc only).
    assert(rows.head._3 == 0L)
  }
}
