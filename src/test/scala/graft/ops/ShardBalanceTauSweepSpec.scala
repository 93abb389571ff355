package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Semantics pins for the two r12 planning tables: q_shard_balance's
  * per-shard accounting against an independently computed (JDK
  * MessageDigest) shard assignment, and q_dedup_tau_sweep's
  * cross-query consistency — the sweep row at the committed verify
  * threshold must count exactly q_doc_dedup's pairs, and both sweep
  * columns must be monotone non-increasing in tau.
  */
class ShardBalanceTauSweepSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("US-ASCII")).map("%02x".format(_)).mkString

  test("q_shard_balance: per-shard doc/token/seq accounting matches an " +
    "independent JDK-MD5 replay; imbalance is the fixed-16 straggler " +
    "factor") {
    val d = Files.createTempDirectory("shardbalspec").toString
    val docs = (0L until 40L).map(id =>
      (id, Seq.fill((id % 7 + 1).toInt)("w").mkString(" ")))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    // independent replay: shard = leading md5 hex digit, tokens = id%7+1
    val expect = docs
      .map { case (id, _) =>
        (Integer.parseInt(md5hex(id.toString).take(1), 16), id % 7 + 1) }
      .groupBy(_._1)
      .map { case (sh, xs) => sh -> ((xs.size.toLong, xs.map(_._2).sum)) }
    val l = PackingQueries.ArtifactBudget
    val totTok = expect.values.map(_._2).sum
    val maxTok = expect.values.map(_._2).max
    val rows = Registry.queryMap("q_shard_balance")(spark, d)
      .as[(Int, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet == expect.keySet)
    rows.foreach { case (sh, nd, nt, ns, share, imb) =>
      val (ed, et) = expect(sh)
      assert((nd, nt) == ((ed, et)), s"shard $sh")
      assert(ns == (nt + l - 1) / l, s"shard $sh seqs")
      assert(share == math.rint(nt.toDouble / totTok * 1e6) / 1e6)
      assert(imb == math.rint(maxTok.toDouble * 16 / totTok * 1e6) / 1e6)
    }
    assert(rows.map(_._2).sum == 40L && rows.map(_._3).sum == totTok)
  }

  test("q_dedup_tau_sweep: the row at the committed verify threshold " +
    "counts exactly q_doc_dedup's pairs; both estimates are monotone " +
    "non-increasing in tau") {
    val dir = "/root/testdata/sf0.001"
    val sweep = Registry.queryMap("q_dedup_tau_sweep")(spark, dir)
      .as[(Double, Long, Long, Double, Long)].collect().sortBy(_._1)
    val pairs = Registry.queryMap("q_doc_dedup")(spark, dir).count()
    val at06 = sweep.find(_._1 == 0.6).get
    assert(at06._2 == pairs,
      s"sweep@0.6 n_pairs=${at06._2} != q_doc_dedup pairs=$pairs")
    sweep.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3,
        s"monotonicity violated between tau=${lo._1} and ${hi._1}")
    }
    sweep.foreach { r =>
      assert(r._4 == math.rint(r._3.toDouble / r._5 * 1e6) / 1e6)
    }
    SharedCaches.release(SharedCaches.Minhash)
  }
}
