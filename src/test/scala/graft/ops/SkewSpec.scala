package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin result set identical to the plain join on skewed data") {
    import spark.implicits._
    // hot key: 90% of the big side is key 1
    val big = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"w$i"))).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (5L, "five")).toDF("k", "name")

    val plain = big.join(small, "k")
      .select("k", "payload", "name").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain)
    assert(plain.count(_.getLong(0) == 1L) == 900) // hot key fully matched
  }

  test("saltedJoin shuffles on (key, salt), not key alone") {
    import spark.implicits._
    val big = (1 to 50).map(i => (i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(big, small, "k", salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(k") && plan.contains("_salt"),
        s"expected (k, _salt) hash partitioning:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
