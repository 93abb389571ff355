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

  test("q_token_entropy: exact 0/1/2-bit closed forms and type counts") {
    val rows = Registry.queryMap("q_token_entropy")(spark, entDir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(0L) == ((4L, 1L, 0.0)))
    assert(rows(1L) == ((4L, 2L, 1.0)))
    assert(rows(2L) == ((4L, 4L, 2.0)))
  }
}
