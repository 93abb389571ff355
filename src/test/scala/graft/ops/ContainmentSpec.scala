package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** q_dedup_containment — the asymmetry contract: a small doc fully
  * contained in a much larger one is reported with containment 1.0
  * even though its Jaccard is far below the symmetric near-dup
  * threshold (the exact pair class q_dedup_ngram structurally misses),
  * and the df-cap keeps corpus-wide boilerplate n-grams from
  * generating pairs.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: 30-word "book"; doc 2: words 10..17 of the book verbatim (a
  // quote -> containment 1.0, jaccard ~ 6/28); doc 3: unrelated; docs
  // 4..23: twenty copies of one boilerplate sentence whose n-grams
  // exceed the df cap (16) -> no pairs may be generated from them.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-contain").toString
    val words = (1 to 30).map(i => s"w$i")
    val book = words.mkString(" ")
    val quote = words.slice(9, 17).mkString(" ")
    val boiler = "all rights reserved by the original publisher entity"
    val docs = Seq((1L, book), (2L, quote), (3L, "totally different text here")) ++
      (4L to 23L).map(i => (i, boiler))
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows =
    Registry.queryMap("q_dedup_containment")(spark, dir)
      .select("doc_a", "doc_b", "containment", "jaccard")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3))))
      .toMap

  test("a verbatim quote has containment 1.0 at Jaccard far below the " +
    "symmetric threshold") {
    val (cont, jac) = rows.getOrElse((1L, 2L), fail(s"pair (1,2) missing: $rows"))
    assert(cont == 1.0, s"quote not fully contained: $cont")
    // 8-word quote -> 6 trigrams, all in the book's 28: jaccard 6/28
    assert(jac == math.rint(6.0 / 28 * 1e6) / 1e6, s"jaccard $jac")
    assert(jac < 0.5, "the pair would NOT pass the symmetric near-dup bar")
  }

  test("df-capped n-grams generate no pairs (boilerplate cluster of 20 " +
    "identical docs is invisible to the candidate join)") {
    assert(!rows.keys.exists { case (a, b) => a >= 4L || b >= 4L },
      s"boilerplate docs leaked into candidates: ${rows.keys}")
  }

  test("unrelated doc pairs with nothing") {
    assert(!rows.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containment dominates jaccard on every emitted pair (the " +
    "asymmetry is one-sided by construction)") {
    assert(rows.nonEmpty)
    rows.values.foreach { case (cont, jac) =>
      assert(cont >= jac && cont >= 0.8 && cont <= 1.0 && jac >= 0.0)
    }
  }

  /** Pure-Scala reference of the DECLARED query (candidate rule + exact
    * verify, no prefilter — the prefilter's soundness claim is exactly
    * that outputs match this).
    */
  private def reference(docs: Seq[(Long, String)]): Map[(Long, Long), (Double, Double)] = {
    def ngrams(t: String): Set[String] = {
      val w = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq
      if (w.length < 3) Set.empty else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val g = docs.map { case (id, t) => id -> ngrams(t) }
      .filter(_._2.nonEmpty)
    val df = g.flatMap(_._2).groupBy(identity).map { case (k, l) => k -> l.size }
    (for {
      (a, nga) <- g; (b, ngb) <- g if a < b
      shared = nga & ngb
      if shared.exists(x => df(x) <= DedupQueries.ContainDfCap)
      cont = shared.size.toDouble / math.min(nga.size, ngb.size)
      if cont >= DedupQueries.ContainTau
    } yield (a, b) -> ((math.rint(cont * 1e6) / 1e6,
      math.rint(shared.size.toDouble / (nga.size + ngb.size - shared.size)
        * 1e6) / 1e6))).toMap
  }

  test("randomized low-entropy corpora: the support-prefiltered query " +
    "equals the unfiltered pure-Scala reference (prefilter soundness " +
    "under exactly the corpus shape that stresses it)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    // tiny vocabulary -> most n-grams repeat across docs, df hovers
    // near the cap, planted slices create true containment pairs
    val vocab = (1 to 12).map(i => s"v$i")
    for (trial <- 1 to 3) {
      val base = (1L to 25L).map { id =>
        val len = 4 + rnd.nextInt(9)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // plant quotes: docs 26..30 are word-slices of random base docs
      val planted = (26L to 30L).map { id =>
        val (_, src) = base(rnd.nextInt(base.size))
        val w = src.split(" ")
        val n = math.max(3, w.length - rnd.nextInt(3))
        val st = rnd.nextInt(math.max(1, w.length - n + 1))
        (id, w.slice(st, st + n).mkString(" "))
      }
      val docs = base ++ planted
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-contain-rnd$trial").toString
      docs.map { case (id, t) => (id, t, "en", "s0") }
        .toDF("doc_id", "text", "lang", "source")
        .write.parquet(s"$d/documents.parquet")
      val got = graft.Registry.queryMap("q_dedup_containment")(spark, d)
        .select("doc_a", "doc_b", "containment", "jaccard")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getDouble(2), r.getDouble(3)))).toMap
      assert(got == reference(docs),
        s"trial $trial: query != reference\nquery: $got\nref:   ${reference(docs)}")
      assert(got.nonEmpty, s"trial $trial produced no pairs — weak trial")
    }
  }
}
