package graft.queries

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Semantics of the distribution-diagnostic profiling queries on a
  * controlled fact table: q_skew_profile's rank-exact percentiles and
  * skew ratio, q_histogram's bin placement and edge arithmetic — checked
  * against hand-computed values, not just row counts.
  */
class ProfileDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  // l_partkey distribution: key 1 x10 rows (hot), keys 2..5 x2, keys
  // 6..10 x1 -> n_keys=10, n_rows=23, max=10.
  // l_extendedprice: chosen so bin edges are exact: mn=0, mx=100, w=10.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("profdiagspec").toString
    val keys = Seq.fill(10)(1L) ++ (2L to 5L).flatMap(k => Seq(k, k)) ++ (6L to 10L)
    val prices = Seq(0.0, 5.0, 15.0, 25.0, 95.0, 100.0) ++
      Seq.fill(keys.size - 6)(50.0)
    keys.zip(prices).toDF("l_partkey", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def run(name: String) = Registry.queryMap(name)(spark, dir)

  test("q_skew_profile: rank-exact percentiles, skew factor, hottest key") {
    val m = run("q_skew_profile").as[(String, Double)].collect().toMap
    assert(m("n_rows") == 23.0 && m("n_keys") == 10.0 && m("max_cnt") == 10.0)
    // count-value freq: cnt1 x5 keys, cnt2 x4, cnt10 x1; cum 5, 9, 10
    assert(m("p50_cnt") == 1.0) // rank ceil(0.5*10)=5 -> cum 5 -> cnt 1
    assert(m("p90_cnt") == 2.0) // rank 9 -> cum 9 -> cnt 2
    assert(m("p99_cnt") == 10.0) // rank ceil(9.9)=10 -> cnt 10
    assert(m("skew_factor") == math.rint(10.0 * 10 / 23 * 1e6) / 1e6)
    assert(m("top1_key") == 1.0 && m("top1_cnt") == 10.0)
  }

  test("q_histogram: bin placement, max lands in the top bin, exact edges") {
    val rows = run("q_histogram")
      .as[(Int, Double, Double, Long)].collect()
      .map { case (b, lo, hi, n) => b -> ((lo, hi, n)) }.toMap
    // 50.0 x (n-6) filler rows land in bin 5
    assert(rows(0) == ((0.0, 10.0, 2L))) // 0.0 and 5.0
    assert(rows(1) == ((10.0, 20.0, 1L)))
    assert(rows(2) == ((20.0, 30.0, 1L)))
    assert(rows(9) == ((90.0, 100.0, 2L))) // 95.0, and 100.0 capped into bin 9
    assert(rows(5)._3 == 17L)
    assert(!rows.contains(3) && !rows.contains(4)) // empty bins absent
  }
}
