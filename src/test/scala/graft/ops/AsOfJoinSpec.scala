package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  test("asOfBackward: latest at-or-before match, null when none, max-id tie-break") {
    import spark.implicits._
    val left = Seq( // (order_id, user, t)
      (100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 30L), (103L, 3L, 5L))
      .toDF("order_id", "user", "lt")
    val right = Seq( // (user, t, rid)
      (1L, 20L, 7L), (1L, 40L, 8L), (1L, 60L, 9L), // user 1: before/with/after
      (2L, 30L, 11L), (2L, 30L, 12L), // exact-equal ts ties -> max rid wins
      (4L, 1L, 99L)) // user with no left rows
      .toDF("user", "rt", "rid")

    val out = AsOfJoin.asOfBackward(left, right, Seq("user"),
      leftTs = "lt", rightTs = "rt", payload = Seq("rid"), rightTiebreak = "rid")
      .orderBy("order_id").collect()

    assert(out(0).getLong(3) == 8L)  // order 100 @50: rid 8 (@40), not 9 (@60)
    assert(out(1).isNullAt(3))       // order 101 @10: no click yet
    assert(out(2).getLong(3) == 12L) // order 102 @30: equal-ts counts; max rid
    assert(out(3).isNullAt(3))       // user 3: right side empty for key
  }

  test("asOfBackward plan: one shuffle on the key, window, no range join") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("order_id", "user", "lt")
    val right = Seq((1L, 5L, 2L)).toDF("user", "rt", "rid")
    val plan = AsOfJoin.asOfBackward(left, right, Seq("user"),
      "lt", "rt", Seq("rid"), "rid").queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
  }

  test("asOfForward: earliest at-or-after match, null when none, max-id tie-break") {
    import spark.implicits._
    val left = Seq( // (order_id, user, t)
      (100L, 1L, 50L), (101L, 1L, 70L), (102L, 2L, 30L), (103L, 3L, 5L))
      .toDF("order_id", "user", "lt")
    val right = Seq(
      (1L, 40L, 7L), (1L, 60L, 8L), // user 1: before/after the @50 row
      (2L, 30L, 11L), (2L, 30L, 12L), // exact-equal ts counts; max rid wins
      (4L, 1L, 99L))
      .toDF("user", "rt", "rid")
    val out = AsOfJoin.asOfForward(left, right, Seq("user"),
      leftTs = "lt", rightTs = "rt", payload = Seq("rid"), rightTiebreak = "rid")
      .orderBy("order_id").collect()
    assert(out(0).getLong(3) == 8L)  // order 100 @50: rid 8 (@60), not 7 (@40)
    assert(out(1).isNullAt(3))       // order 101 @70: nothing after
    assert(out(2).getLong(3) == 12L) // order 102 @30: equal-ts counts; max rid
    assert(out(3).isNullAt(3))       // user 3: right side empty for key
  }

  test("asOfForward plan: window, no join") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("order_id", "user", "lt")
    val right = Seq((1L, 5L, 2L)).toDF("user", "rt", "rid")
    val plan = AsOfJoin.asOfForward(left, right, Seq("user"),
      "lt", "rt", Seq("rid"), "rid").queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected window plan:\n$plan")
  }

  test("differential: both directions match brute force on a random log") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // deliberately small time domain -> many exact-ts ties exercise the
    // tie-break contract (backward AND forward resolve to max rid)
    val left = (1L to 120L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
    val right = (1L to 150L).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, 1000L + i))
    val lDf = left.toDF("order_id", "user", "lt")
    val rDf = right.toDF("user", "rt", "rid")

    def expect(dirBack: Boolean): Map[Long, Option[Long]] =
      left.map { case (oid, u, lt) =>
        val cands = right.filter { case (ru, rt, _) =>
          ru == u && (if (dirBack) rt <= lt else rt >= lt) }
        val best =
          if (cands.isEmpty) None
          else if (dirBack)
            // latest ts; ties -> max rid
            Some(cands.maxBy(c => (c._2, c._3))._3)
          else
            // earliest ts; ties -> max rid
            Some(cands.minBy(c => (c._2, -c._3))._3)
        oid -> best
      }.toMap

    val gotBack = AsOfJoin.asOfBackward(lDf, rDf, Seq("user"),
      "lt", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(gotBack == expect(dirBack = true))

    val gotFwd = AsOfJoin.asOfForward(lDf, rDf, Seq("user"),
      "lt", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(gotFwd == expect(dirBack = false))

    // nearest: min |rt - lt|; distance ties -> backward; within a side,
    // backward ties -> max rid, forward ties -> MIN rid (doc'd single-
    // sort convention)
    val expectNearest: Map[Long, Option[Long]] =
      left.map { case (oid, u, lt) =>
        val cands = right.filter(_._1 == u)
        val best =
          if (cands.isEmpty) None
          else {
            val back = cands.filter(_._2 <= lt)
            val fwd = cands.filter(_._2 >= lt)
            val b = if (back.isEmpty) None else Some(back.maxBy(c => (c._2, c._3)))
            val f = if (fwd.isEmpty) None else Some(fwd.minBy(c => (c._2, c._3)))
            (b, f) match {
              case (None, None) => None
              case (Some(bb), None) => Some(bb._3)
              case (None, Some(ff)) => Some(ff._3)
              case (Some(bb), Some(ff)) =>
                if (lt - bb._2 <= ff._2 - lt) Some(bb._3) else Some(ff._3)
            }
          }
        oid -> best
      }.toMap
    val gotNearest = AsOfJoin.asOfNearest(lDf, rDf, Seq("user"),
      "lt", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(gotNearest == expectNearest)
  }

  test("null payload fields never mix right rows: the matched row wins atomically") {
    import spark.implicits._
    // The matched (nearest-in-direction) right row carries a NULL aux.
    // Per-column ignoreNulls windows would fill aux from a FARTHER row
    // — emitting columns from two different right rows. The struct pick
    // must emit the matched row's NULL instead.
    val left = Seq((100L, 1L, 50L)).toDF("order_id", "user", "lt")
    val right = Seq((1L, 20L, 7L, Option("x")), (1L, 40L, 8L, Option.empty[String]))
      .toDF("user", "rt", "rid", "aux")
    val out = AsOfJoin.asOfBackward(left, right, Seq("user"),
      "lt", "rt", Seq("rid", "aux"), "rid").collect()(0)
    assert(out.getLong(3) == 8L)
    assert(out.isNullAt(4),
      "asof_aux must be the matched row's NULL, not a farther row's value")

    val left2 = Seq((200L, 1L, 10L)).toDF("order_id", "user", "lt")
    val right2 = Seq((1L, 20L, 7L, Option.empty[String]), (1L, 40L, 8L, Option("y")))
      .toDF("user", "rt", "rid", "aux")
    val outF = AsOfJoin.asOfForward(left2, right2, Seq("user"),
      "lt", "rt", Seq("rid", "aux"), "rid").collect()(0)
    assert(outF.getLong(3) == 7L && outF.isNullAt(4))

    val left3 = Seq((300L, 1L, 41L)).toDF("order_id", "user", "lt")
    val right3 = Seq((1L, 40L, 8L, Option.empty[String]), (1L, 100L, 9L, Option("z")))
      .toDF("user", "rt", "rid", "aux")
    val outN = AsOfJoin.asOfNearest(left3, right3, Seq("user"),
      "lt", "rt", Seq("rid", "aux"), "rid").collect()(0)
    assert(outN.getLong(3) == 8L && outN.isNullAt(4))
  }

  test("asOfNearest plan: ONE shuffle + one sort computes both frames") {
    import spark.implicits._
    val lDf = Seq((1L, 1L, 5L)).toDF("order_id", "user", "lt")
    val rDf = Seq((1L, 3L, 100L)).toDF("user", "rt", "rid")
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p =
      try AsOfJoin.asOfNearest(lDf, rDf, Seq("user"), "lt", "rt",
        Seq("rid"), "rid").queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", saved)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    assert(p.collect { case e: ShuffleExchangeExec => e }.size == 1,
      s"expected exactly one shuffle:\n$p")
    assert(p.collect { case w: WindowExec => w }.size == 1,
      s"both frames should share one WindowExec:\n$p")
    assert(p.collect { case j: BaseJoinExec => j }.isEmpty,
      s"nearest must not plan a join:\n$p")
  }
}
