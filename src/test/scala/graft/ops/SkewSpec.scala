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

    // multiset compare (sorted Seq, not Set): a regression that matched a
    // big row against several small-side replicas would duplicate rows,
    // which a Set comparison could never detect
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "payload", "name").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSeq.sorted
    val plain = rows(big.join(small, "k"))
    val salted = rows(Skew.saltedJoin(big, small, "k", salts = 8))
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) == 900) // hot key fully matched
  }

  test("saltedJoin shuffles on (key, salt), not key alone") {
    import spark.implicits._
    val big = (1 to 50).map(i => (i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "name")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(big, small, "k", salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(k") && plan.contains("_salt"),
        s"expected (k, _salt) hash partitioning:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    }
  }
}
