package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Hand-computed semantics for the two r12 curation signals:
  * q_domain_cap's integer-exact budget + quality-ranked prefix election
  * (including the full-drop edge where a source's best doc alone
  * overflows the budget), and q_token_entropy's closed-form values on
  * distributions whose entropy is exact in bits (0, 1, 2).
  */
class DomainCapEntropySpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int, w: String = "w") = Seq.fill(n)(w).mkString(" ")

  // srcA: 40-tok (79 chars, qp=2), 12-tok (qp=1), 5-tok (qp=0) = 57 tok.
  // srcB: one 43-tok doc (qp=2). total=100, n_sources=2,
  // budget = (4*100) div (5*2) = 40.
  // srcA keeps exactly the 40-tok doc (cum 40 <= 40; next cum 52 > 40);
  // srcB keeps NOTHING (its only doc overflows: cum 43 > 40).
  private lazy val capDir: String = {
    val d = Files.createTempDirectory("domaincapspec").toString
    Seq((0L, doc(40), "srcA"), (1L, doc(12), "srcA"), (2L, doc(5), "srcA"),
      (3L, doc(43), "srcB"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // entropies exact in bits: 4x same token -> 0; 2+2 -> 1; 4 distinct -> 2.
  private lazy val entDir: String = {
    val d = Files.createTempDirectory("tokentropyspec").toString
    Seq((0L, "x x x x"), (1L, "a a b b"), (2L, "a b c d"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q_domain_cap: integer budget, rank-prefix election, full-drop " +
    "edge, capped flag and kept fraction") {
    val rows = Registry.queryMap("q_domain_cap")(spark, capDir)
      .as[(String, Long, Long, Long, Long, Long, Int, Double)].collect()
      .map(r => r._1 -> r).toMap
    // (source, n_docs, n_tokens, budget, n_kept, tokens_kept, capped, frac)
    assert(rows("srcA") ==
      (("srcA", 3L, 57L, 40L, 1L, 40L, 1, math.rint(40.0 / 57 * 1e6) / 1e6)))
    assert(rows("srcB") == (("srcB", 1L, 43L, 40L, 0L, 0L, 1, 0.0)))
  }

  test("q_domain_cap_hash (r18): stateless selector — uncapped sources " +
    "keep everything (tau=1), a capped mega-source keeps a strict " +
    "hash-subset with the miss measured, and the kept set is invariant " +
    "to input partitioning (no window, no order dependence)") {
    import org.apache.spark.sql.functions._
    val d = Files.createTempDirectory("domaincaphash").toString
    // mega-source: 200 x 10-tok docs = 2000 tok; small: 5 x 10-tok.
    // total=2050, budget=(4*2050) div (5*2)=820 -> mega tau=0.41,
    // small tau=1.
    ((1L to 200L).map(i => (i, doc(10), "mega")) ++
      (500L to 504L).map(i => (i, doc(10), "small")))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_domain_cap_hash")(spark, d)
      .as[(String, Long, Long, Long, Double, Long, Long, Int, Double)]
      .collect().map(r => r._1 -> r).toMap
    val mega = rows("mega")
    assert(rows("small") ==
      (("small", 5L, 50L, 820L, 1.0, 5L, 50L, 0, 0.0)))
    assert(mega._4 == 820L && mega._5 == 0.41 && mega._8 == 1)
    // strict subset, non-empty, and the measured miss is the report's
    // own rel_dev column
    assert(mega._6 > 0L && mega._6 < 200L, s"kept ${mega._6} of 200")
    assert(mega._9 ==
      math.rint((mega._7 - 820L).toDouble / 820L * 1e6) / 1e6)
    // partitioning invariance: the kept SET is a pure function of
    // doc_id hashes — identical summary under any input layout
    val base = spark.read.parquet(s"$d/documents.parquet")
    val d7 = Files.createTempDirectory("domaincaphash7").toString
    base.repartition(7).write.parquet(s"$d7/documents.parquet")
    val again = Registry.queryMap("q_domain_cap_hash")(spark, d7)
      .as[(String, Long, Long, Long, Double, Long, Long, Int, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(again == rows)
  }

  test("q_token_entropy: exact 0/1/2-bit closed forms and type counts") {
    val rows = Registry.queryMap("q_token_entropy")(spark, entDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(0L) == ((4L, 1L, 0.0)))
    assert(rows(1L) == ((4L, 2L, 1.0)))
    assert(rows(2L) == ((4L, 4L, 2.0)))
  }
}
