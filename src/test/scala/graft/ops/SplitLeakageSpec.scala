package graft.ops

import graft.{Registry, SparkSpec}

/** The leakage-audit / cluster-aware-split pairing: the dedup-oblivious
  * hash split leaks near-dup pairs across split boundaries; splitting
  * on the cluster representative drives the same leak count to zero BY
  * CONSTRUCTION (a verified pair is an edge, so both ends share a
  * cluster and therefore a split).
  */
class SplitLeakageSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_split_leakage: classes partition all verified pairs; shares " +
    "sum to 1; leak flag marks exactly the cross-split classes") {
    val rows = Registry.queryMap("q_split_leakage")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    rows.foreach { case (lo, hi, _, _, leak) =>
      assert(lo <= hi)
      assert(leak == (if (lo != hi) 1 else 0))
    }
  }

  test("q_split_cluster_aware: zero leaking pairs, every doc labeled, " +
    "group count never exceeds doc count") {
    val rows = Registry.queryMap("q_split_cluster_aware")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, nGroups, _, nLeaking) =>
      assert(nLeaking == 0L, "cluster-aware split must not leak")
      assert(nGroups <= nDocs && nGroups >= 1)
    }
    val total = rows.map(_._2).sum
    val corpus = graft.Tables.t(spark, dir, "documents").count()
    assert(total == corpus, s"split totals $total != corpus $corpus")
  }
}
