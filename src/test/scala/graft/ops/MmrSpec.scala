package graft.ops

import graft.{Registry, SparkSpec}

/** q_mmr_rerank falsifiability: the redundancy penalty must CHANGE the
  * greedy picks when near-duplicates sit in the shortlist, and must
  * change nothing when they don't — both directions on planted
  * shortlists (the selection loop is corpus-free, so the spec drives
  * it directly), plus output-shape receipts on the declared query.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def sims(rows: (Long, Long, Long, Double)*) =
    rows.toSeq.toDF("query_id", "va", "vb", "sim")

  // candidates: A(1) rel .9, B(2) rel .89 — a near-dup of A — and
  // C(3) rel .5, unrelated
  private val cand = Seq(
    (1L, 1L, 0.9), (1L, 2L, 0.89), (1L, 3L, 0.5))
    .toDF("query_id", "vec_id", "cos")

  test("the penalty breaks redundancy: a near-dup of the first pick " +
    "loses step 2 to a diverse candidate") {
    val s = sims((1L, 1L, 2L, 0.99), (1L, 2L, 1L, 0.99),
      (1L, 1L, 3L, 0.0), (1L, 3L, 1L, 0.0),
      (1L, 2L, 3L, 0.0), (1L, 3L, 2L, 0.0))
    val out = SimilarityQueries.mmrSelect(cand, s, 2)
      .orderBy("step").collect()
    // step 1: pure relevance -> A; step 2: B pays 0.3*0.99 and scores
    // 0.326 < C's 0.35 -> the diverse C wins despite lower relevance
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 3L),
      s"got ${out.mkString(",")}")
    assert(out(1).getDouble(4) == 0.0, "C is unrelated to A: penalty 0")
  }

  test("control: without redundancy the greedy order is relevance " +
    "order") {
    val s = sims((1L, 1L, 2L, 0.0), (1L, 2L, 1L, 0.0),
      (1L, 1L, 3L, 0.0), (1L, 3L, 1L, 0.0),
      (1L, 2L, 3L, 0.0), (1L, 3L, 2L, 0.0))
    val out = SimilarityQueries.mmrSelect(cand, s, 3)
      .orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L),
      s"got ${out.mkString(",")}")
  }

  test("negative sims survive the penalty fold: the reported penalty " +
    "is the true (negative) max-sim, not floored at zero") {
    // A(.9) picked first; B and C are ANTI-correlated with A (negative
    // cosine). penalty(B) = -0.8, penalty(C) = -0.1 — a zero-seeded
    // running max would floor both to 0.0 and misreport the penalty
    // column (and mis-rank any candidate whose boost depends on it).
    val c2 = Seq((1L, 1L, 0.9), (1L, 2L, 0.5), (1L, 3L, 0.4))
      .toDF("query_id", "vec_id", "cos")
    val s = sims((1L, 1L, 2L, -0.8), (1L, 2L, 1L, -0.8),
      (1L, 1L, 3L, -0.1), (1L, 3L, 1L, -0.1),
      (1L, 2L, 3L, 0.0), (1L, 3L, 2L, 0.0))
    val out = SimilarityQueries.mmrSelect(c2, s, 2)
      .orderBy("step").collect()
    // step 2: B scores 0.7*0.5 - 0.3*(-0.8) = 0.59 > C's 0.31
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L),
      s"got ${out.mkString(",")}")
    assert(out(1).getDouble(4) == -0.8,
      s"penalty must be the negative max-sim, got ${out(1).getDouble(4)}")
  }

  test("declared query shape: every query gets exactly k distinct " +
    "picks, step 1 is the exact nearest neighbor") {
    val dir = "/root/testdata/sf0.001"
    val out = Registry.queryMap("q_mmr_rerank")(spark, dir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((q, rows) <- byQ) {
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10),
        s"query $q steps")
      assert(rows.map(_.getLong(2)).distinct.length == 10,
        s"query $q picks must be distinct")
      val s1 = rows.find(_.getInt(1) == 1).get
      assert(s1.getDouble(4) == 0.0, s"query $q step-1 penalty")
      assert(s1.getDouble(3) == rows.map(_.getDouble(3)).max,
        s"query $q step 1 must be the most relevant pick")
    }
  }
}
