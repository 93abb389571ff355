package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selfPairsWithin matches the naive O(n^2) formulation exactly") {
    // keys spread across buckets, including exact-boundary gaps (== window)
    // and same-timestamp rows
    val rows = Seq(
      (1L, 10L, 0L), (2L, 10L, 100L), (3L, 10L, 100L), (4L, 10L, 101L),
      (5L, 10L, 299L), (6L, 10L, 300L), (7L, 10L, 601L), (8L, 10L, 9999L),
      (9L, 20L, 100L), (10L, 20L, 400L), (11L, 20L, 401L), (12L, 30L, 5L))
    val df = rows.toDF("event_id", "user_id", "sec")
    val w = 300L

    val got = RangeJoin.selfPairsWithin(df, "user_id", "sec", "event_id", w)
      .select("user_id", "id_a", "id_b", "gap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val naive = (for {
      (a, ua, ta) <- rows; (b, ub, tb) <- rows
      if ua == ub && a < b && math.abs(ta - tb) <= w
    } yield (ua, a, b, math.abs(ta - tb))).toSet

    assert(got == naive)
    assert(naive.contains((10L, 5L, 6L, 1L)))   // adjacent-bucket pair
    assert(naive.contains((10L, 2L, 3L, 0L)))   // same-timestamp pair
    assert(!naive.exists { case (_, a, b, _) => a == 6L && b == 7L })
  }

  test("each qualifying pair is emitted exactly once (no bucket dup)") {
    val df = Seq((1L, 1L, 299L), (2L, 1L, 300L), (3L, 1L, 301L))
      .toDF("event_id", "user_id", "sec")
    val out = RangeJoin.selfPairsWithin(df, "user_id", "sec", "event_id", 300L)
    assert(out.count() == out.dropDuplicates("id_a", "id_b").count())
    assert(out.count() == 3L)
  }

  test("plan is an equi-join, not BroadcastNestedLoop/Cartesian") {
    val df = Seq((1L, 1L, 10L), (2L, 1L, 20L)).toDF("event_id", "user_id", "sec")
    val plan = RangeJoin.selfPairsWithin(df, "user_id", "sec", "event_id", 300L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"range join fell back to a product plan:\n$plan")
  }
}
