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

  test("null FKs count as orphans of nothing (left-anti semantics)") {
    import spark.implicits._
    val parent = Seq(1L).toDF("pk")
    val child = Seq(Option(1L), None).toDF("fk")
    // null never equi-matches: the null row is reported as an orphan,
    // matching the reference's NOT-VALIDATED stance (it never checks data)
    assert(Constraints.fkOrphanCount(child, "fk", parent, "pk") == 1)
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
