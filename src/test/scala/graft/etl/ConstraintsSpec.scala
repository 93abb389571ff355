package graft.etl

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {

  test("fkOrphanCount: zero on consistent data, exact count on orphans (E2)") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val okChild = Seq(1L, 1L, 3L).toDF("fk")
    val badChild = Seq(1L, 9L, 8L, 9L).toDF("fk")
    assert(Constraints.fkOrphanCount(okChild, "fk", parent, "pk") == 0)
    assert(Constraints.fkOrphanCount(badChild, "fk", parent, "pk") == 3)
    val row = Constraints.fkOrphans("edge", badChild, "fk", parent, "pk").head()
    assert(row.getString(0) == "edge" && row.getLong(1) == 3L)
  }

  test("NULL child keys are NOT orphans (SQL FK semantics) in all " +
    "three validation variants") {
    import spark.implicits._
    val parent = Seq(1L).toDF("pk")
    val child = Seq(Option(1L), None, Option(9L)).toDF("fk")
    // a real FK constraint accepts NULL keys (matching is simply not
    // enforced); only the NON-NULL unmatched key (9) is an orphan —
    // the pre-r12 left-anti count flagged every nullable FK column
    assert(Constraints.fkOrphanCount(child, "fk", parent, "pk") == 1)
    assert(Constraints.fkOrphans("e", child, "fk", parent, "pk")
      .head().getLong(1) == 1L)
    val fused = Constraints.fkOrphansFused(child,
      Seq(Constraints.FkEdge("e", "fk", parent, "pk",
        broadcastParent = true))).head()
    assert(fused.getLong(1) == 1L)
  }

  test("index-name mangling dedupes and truncates (E1 parity)") {
    val in = Seq("idx_customer_region", "idx_customer_region", "short")
    val out = Constraints.mangleIndexNames(in, maxLen = 12)
    assert(out.distinct.size == 3)
    assert(out.forall(_.length <= 12))
    assert(out.head == "idx_customer")
  }

  test("applyLayout produces requested partitioning (E1 as layout)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 7, i)).toDF("k", "v")
    val laid = Constraints.applyLayout(df,
      Constraints.IndexAdvice("t", Seq("k")), numPartitions = 4)
    assert(laid.rdd.getNumPartitions == 4)
    assert(laid.count() == 100)
  }
}
