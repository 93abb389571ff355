package graft.queries

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Hand-computed semantics for the two governance/profiling additions:
  * q_quantile_discrete's type-1 (lower) quantile definition — the rank
  * arithmetic is INTEGER ((p*N+99) div 100), so every asserted value is
  * exact, not "close" — and q_k_anonymity's equivalence-class accounting
  * (below-k class/row counts, the l-diversity=1 disclosure count).
  */
class GovernanceProfileSpec extends SparkSpec {
  import spark.implicits._

  // documents: token lengths 1,1,1,2,3,3,4,10 (N=8).
  // rank(p) = ceil(p*8/100): p25->2, p50->4, p75->6, p90->8, p99->8.
  // cum: v=1 ->3, v=2 ->4, v=3 ->6, v=4 ->7, v=10 ->8.
  private lazy val docDir: String = {
    val d = Files.createTempDirectory("quantdiscspec").toString
    val lens = Seq(1, 1, 1, 2, 3, 3, 4, 10)
    lens.zipWithIndex
      .map { case (n, i) => (i.toLong, Seq.fill(n)("w").mkString(" ")) }
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // customer: 4 QI classes (nation, segment) with k = 1, 3, 6, 12;
  // the k=1 class and the k=6 class have a CONSTANT negative-balance
  // indicator (all-negative resp. all-positive) -> l1_classes = 2.
  private lazy val custDir: String = {
    val d = Files.createTempDirectory("kanonspec").toString
    val rows =
      Seq((1L, "A", -5.0)) ++
        Seq((1L, "B", -1.0), (1L, "B", 2.0), (1L, "B", 3.0)) ++
        (1 to 6).map(i => (2L, "A", i.toDouble)) ++
        (1 to 12).map(i => (2L, "B", if (i % 2 == 0) -i.toDouble else i.toDouble))
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      .write.parquet(s"$d/customer.parquet")
    d
  }

  test("q_quantile_discrete: type-1 quantiles exact on a planted length " +
    "distribution, including ties and the p90/p99 top-rank collapse") {
    val rows = Registry.queryMap("q_quantile_discrete")(spark, docDir)
      .as[(Int, Long, Long, Long)].collect()
      .map { case (p, rank, v, n) => p -> ((rank, v, n)) }.toMap
    assert(rows.keySet == Set(25, 50, 75, 90, 99))
    assert(rows(25) == ((2L, 1L, 8L))) // cum(1)=3 >= 2
    assert(rows(50) == ((4L, 2L, 8L))) // cum(2)=4 >= 4 — tie boundary exact
    assert(rows(75) == ((6L, 3L, 8L)))
    assert(rows(90) == ((8L, 10L, 8L))) // ceil(7.2)=8 -> the max value
    assert(rows(99) == ((8L, 10L, 8L)))
  }

  test("q_k_anonymity: below-k class/row counts, min_k, and the " +
    "l-diversity=1 disclosure count on planted equivalence classes") {
    val out = Registry.queryMap("q_k_anonymity")(spark, custDir)
      .as[(Int, Long, Long, Double, Long, Long, Long)].collect()
    // columns: k_threshold, classes_below, rows_below, row_frac_below,
    //          n_classes, min_k, l1_classes
    out.foreach { case (_, _, _, _, nc, mk, l1) =>
      assert(nc == 4L && mk == 1L && l1 == 2L)
    }
    val byK = out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byK(2) == ((1L, 1L, math.rint(1.0 / 22 * 1e6) / 1e6)))
    assert(byK(5) == ((2L, 4L, math.rint(4.0 / 22 * 1e6) / 1e6)))
    assert(byK(10) == ((3L, 10L, math.rint(10.0 / 22 * 1e6) / 1e6)))
    assert(byK(25) == ((4L, 22L, 1.0)))
  }

  test("q_quantile_grouped: per-lang type-1 quantiles exact on two " +
    "planted distributions (the group key changes ranks, not the rule)") {
    val d = Files.createTempDirectory("quantgrpspec").toString
    // lang aa: lengths 1,2,3,4 (N=4) -> ranks 1,2,3,4,4 -> values 1,2,3,4,4
    // lang bb: lengths 5,5,10 (N=3) -> ranks 1,2,3,3,3 -> values 5,5,10,10,10
    val rows = Seq((1, "aa"), (2, "aa"), (3, "aa"), (4, "aa"),
      (5, "bb"), (5, "bb"), (10, "bb"))
    rows.zipWithIndex
      .map { case ((n, l), i) =>
        (i.toLong, Seq.fill(n)("w").mkString(" "), l) }
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    val got = Registry.queryMap("q_quantile_grouped")(spark, d)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("aa", 25, 1L, 1L, 4L), ("aa", 50, 2L, 2L, 4L),
      ("aa", 75, 3L, 3L, 4L), ("aa", 90, 4L, 4L, 4L),
      ("aa", 99, 4L, 4L, 4L),
      ("bb", 25, 1L, 5L, 3L), ("bb", 50, 2L, 5L, 3L),
      ("bb", 75, 3L, 10L, 3L), ("bb", 90, 3L, 10L, 3L),
      ("bb", 99, 3L, 10L, 3L)), got)
  }
}
