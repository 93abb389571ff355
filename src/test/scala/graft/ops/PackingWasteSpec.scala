package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Packing-waste curve: brute-force equality on a controlled corpus, the
  * cross-query tie-in with q_context_fit (same truncation-coverage
  * definition), and the ordering invariant that packing never pads more
  * than the naive layout.
  */
class PackingWasteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("pwspec").toString
    // two shards with known token counts: srcA docs of 10/20/40 tokens,
    // srcB docs of 7/70
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    Seq((1L, mk(10), "srcA"), (2L, mk(20), "srcA"), (3L, mk(40), "srcA"),
      (4L, mk(7), "srcB"), (5L, mk(70), "srcB"))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("brute-force equality on a controlled two-shard corpus") {
    val rows = Registry.queryMap("q_packing_waste")(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val lens = Map("srcA" -> Seq(10L, 20L, 40L), "srcB" -> Seq(7L, 70L))
    val tokTotal = lens.values.flatten.sum // 147
    val nDocs = 5L
    // the shared window list itself (incl. the r13 production-scale
    // 2048 row — everything fits, so it exercises the ceil==1 regime)
    for (l <- PackingQueries.WasteWindows) {
      val cov = lens.values.flatten.map(n => math.min(n, l.toLong)).sum
      val seqs = lens.values.map(ns => (ns.sum + l - 1) / l).sum
      // HALF_UP to match Spark's round()
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val exp = (seqs,
        r6(1.0 - cov.toDouble / (nDocs * l)),
        r6(1.0 - tokTotal.toDouble / (seqs * l)),
        r6(cov.toDouble / tokTotal))
      assert(rows(l) == exp, s"window $l")
    }
  }

  test("trunc_coverage is the SAME number q_context_fit emits") {
    val pw = Registry.queryMap("q_packing_waste")(spark, dir)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    val cf = Registry.queryMap("q_context_fit")(spark, dir)
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(pw.keySet == cf.keySet)
    pw.keySet.foreach(l => assert(pw(l) == cf(l), s"window $l"))
  }

  test("packing never pads more than the naive pad-to-L layout") {
    val rows = Registry.queryMap("q_packing_waste")(spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (l, _, padded, packed, _) =>
      assert(packed <= padded, s"window $l: packed $packed > naive $padded")
    }
  }
}
