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

  test("differential: random corpus matches a brute-force reference") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    // small vocab + 8..14-token docs -> plenty of genuine 8-gram
    // collisions across docs, plus sub-8-token docs (excluded)
    val corpus = (1L to 30L).map { id =>
      val n = 5 + rnd.nextInt(10)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (id, text, "en", s"src${id % 3}")
    }
    val d = Files.createTempDirectory("spandiff").toString
    corpus.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")

    // brute force: distinct 8-gram spans per doc
    val docSpans: Map[Long, Set[String]] = corpus.map { case (id, t, _, _) =>
      id -> t.split(" ").toSeq.sliding(8).filter(_.size == 8)
        .map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    val spanDocs = docSpans.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val dup = spanDocs.filter(_._2.size >= 2).keySet

    val gotProfile = Registry.queryMap("q_dedup_spans")(spark, d)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val expProfile = docSpans.map { case (id, ss) =>
      id -> ((ss.size, ss.count(dup).toLong))
    }
    assert(gotProfile == expProfile)

    val srcOf = corpus.map(c => c._1 -> c._4).toMap
    val expPairs = spanDocs.values.toSeq
      .map(_.map(srcOf))                       // span -> source set
      .flatMap(ss => for (a <- ss; b <- ss if a < b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gotPairs = Registry.queryMap("q_source_overlap")(spark, d)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(gotPairs == expPairs)
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
