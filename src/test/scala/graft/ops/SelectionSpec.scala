package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Data-selection operators: DSIR importance weights must RANK seed-like
  * docs above dissimilar ones when the seed slice has a distinctive
  * bigram distribution (and must be ~flat when it doesn't — the
  * falsifiable-in-both-directions pattern); the Heaps/Zipf curves are
  * differential-tested against brute-force recounts.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val d = Files.createTempDirectory("selspec").toString
    rows.map { case (id, t) => (id, t, "en", s"src${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // Seed docs mention the seed token and otherwise use the A-vocabulary;
  // "near" docs use the A-vocabulary WITHOUT the token; "far" docs a
  // disjoint B-vocabulary. DSIR must rank near > far.
  private val vocabA = Vector("alpha", "apex", "arc", "atom", "axis")
  private val vocabB = Vector("bog", "bulk", "bun", "buzz", "bay")

  private def mk(rnd: scala.util.Random, v: Vector[String], n: Int) =
    Seq.fill(n)(v(rnd.nextInt(v.size))).mkString(" ")

  test("dsir: seed-like docs outrank dissimilar docs; seed token drives it") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 150L).map { id =>
      if (id < 50L) // seed: contains the token, A-vocab context
        (id, s"${mk(rnd, vocabA, 6)} stream ${mk(rnd, vocabA, 6)}")
      else if (id < 100L) (id, mk(rnd, vocabA, 13)) // near
      else (id, mk(rnd, vocabB, 13)) // far
    }
    val out = Registry.queryMap("q_dsir_sample")(spark, writeDocs(docs))
      .select("doc_id", "is_seed", "logw_avg")
      .as[(Long, Int, Double)].collect()
    val byDoc = out.map(r => r._1 -> r._3).toMap
    val near = (50L until 100L).flatMap(byDoc.get)
    val far = (100L until 150L).flatMap(byDoc.get)
    // top-100 of 150: all 50 seeds + all 50 near docs should beat every
    // far doc on average weight (disjoint vocab -> negative log ratios)
    assert(near.size == 50, s"near docs in top-k: ${near.size}")
    if (far.nonEmpty)
      assert(near.min > far.max,
        s"near min ${near.min} must exceed far max ${far.max}")
    // seeds themselves surface
    assert(out.count(_._2 == 1) == 50)
  }

  test("dsir: no-signal corpus (seed bigrams ~ raw bigrams) scores ~flat") {
    val rnd = new scala.util.Random(8)
    // every doc: same vocabulary; every 3rd doc carries the seed token
    // embedded in the SAME distribution -> target ≈ raw, weights ≈ 0.
    // 600 docs × 24 tokens so per-bucket count noise (the only weight
    // source here) is well below the separable corpus's ~1.0 separation.
    val docs = (0L until 600L).map { id =>
      val base = mk(rnd, vocabA ++ vocabB, 24)
      if (id % 3 == 0) (id, s"$base stream") else (id, base)
    }
    val out = Registry.queryMap("q_dsir_sample")(spark, writeDocs(docs))
      .select("is_seed", "logw_avg").as[(Int, Double)].collect()
    // The seed docs themselves keep a residual positive weight (their
    // defining token's bigrams occur only in the seed slice — inherent
    // to a predicate-defined seed). The honest no-signal claim is about
    // everyone ELSE: non-seed docs draw from the identical bigram
    // distribution, so their weights shrink toward 0 — an order of
    // magnitude below the separable corpus's |far| ~ 1 separation.
    val nonSeed = out.filter(_._1 == 0).map(r => math.abs(r._2))
    assert(nonSeed.nonEmpty)
    assert(nonSeed.max < 0.1,
      s"no-signal non-seed |logw_avg| up to ${nonSeed.max}")
  }

  test("heaps law: vocab at every octile equals a brute-force recount") {
    val rnd = new scala.util.Random(9)
    val all = vocabA ++ vocabB
    val docs = (0L until 64L).map(id => (id, mk(rnd, all, 3 + rnd.nextInt(9))))
    val dir = writeDocs(docs)
    val rows = Registry.queryMap("q_heaps_law")(spark, dir)
      .select("n", "octile", "cutoff", "n_occurrences", "vocab")
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(rows.length == 16)
    // brute force per (n, cutoff)
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    def grams(ts: Seq[String], n: Int): Seq[String] =
      if (n == 1) ts else ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    rows.foreach { case (n, _, cut, occ, voc) =>
      val in = docs.filter(_._1 < cut).map(d => grams(toks(d._1), n))
      assert(occ == in.map(_.size.toLong).sum, s"occ n=$n cut=$cut")
      assert(voc == in.flatten.distinct.size.toLong, s"vocab n=$n cut=$cut")
    }
    // growth exponent defined from octile 2 on wherever counts moved
    val betas = Registry.queryMap("q_heaps_law")(spark, dir)
      .filter(col("octile") > 1).select("beta_incr")
      .as[Option[Double]].collect()
    assert(betas.exists(_.isDefined))
  }

  test("zipf curve: ranks and counts equal brute force; slopes negative") {
    val rnd = new scala.util.Random(10)
    val all = vocabA ++ vocabB
    // skewed draw: term i with weight ~ 1/(i+1)
    val weighted = all.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(all.size - i)(w) }
    val docs = (0L until 64L).map(id =>
      (id, mk(rnd, weighted.toVector, 3 + rnd.nextInt(9))))
    val dir = writeDocs(docs)
    val rows = Registry.queryMap("q_zipf_curve")(spark, dir)
      .select("rank", "term", "cnt", "slope_incr")
      .as[(Long, String, Long, Option[Double])].collect()
    val brute = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(64)
    assert(rows.map(r => r._2 -> r._3).toSeq == brute)
    assert(rows.map(_._1).toSeq == (1L to brute.size))
    // rank-frequency slope is non-positive wherever counts strictly drop
    rows.sliding(2).foreach {
      case Array((_, _, c1, _), (_, _, c2, Some(s))) if c2 < c1 =>
        assert(s < 0, s"slope $s must be negative on a strict drop")
      case _ => ()
    }
  }
}
