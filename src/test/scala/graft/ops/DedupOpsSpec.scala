package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels a diameter-5 chain and a separate pair") {
    // chain 1-2-3-4-5-6 (diameter 5) + isolated pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents is direction-agnostic (edges symmetrized)") {
    // min id at the SINK of every edge: propagation must flow both ways
    val edges = Seq((5L, 1L), (6L, 5L), (7L, 6L)).toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("connectedComponents with too few iterations under-merges (contract)") {
    // documents the iters-vs-diameter contract: a 6-chain needs >= 5 hops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 2)
      .as[(Long, Long)].collect().toMap
    assert(got(6L) == 4L) // only reached 2 hops back, not the global min
  }
}
