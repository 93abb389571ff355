package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared skew-safe size derivation (r16 verdict #1): every stored
  * artifact family stamps its per-key population column (LexIndex df,
  * BandIndex bsz, ContainIndex df, MediaSigStore bsz) via ONE helper —
  * [[BandIndex.withKeyCount]], groupBy + join-back — instead of a
  * per-family `count(*) over (partition by key)` window whose hottest
  * key is an unsplittable straggler. The differential here pins the
  * replacement's semantics: join-back == window row-for-row on a
  * planted hot key, for both the single-key and composite-key shapes
  * the families use.
  */
class KeyCountSpec extends SparkSpec {
  import spark.implicits._

  test("withKeyCount == window count row-for-row on a planted hot key") {
    // One boilerplate key holding most rows (the Zipf head the caps
    // govern) + a long tail of small keys.
    val rows = (1 to 5000).map(i => ("hot", i.toLong)) ++
      (1 to 200).flatMap(k => (1 to 3).map(i => (s"tail_$k", (10000 + k * 10 + i).toLong)))
    val df = rows.toDF("g1", "doc_id")

    val viaHelper = BandIndex.withKeyCount(df, Seq("g1"), "df")
      .select("g1", "doc_id", "df")
    val viaWindow = df.withColumn("df",
        count(lit(1)).over(Window.partitionBy("g1")))
      .select("g1", "doc_id", "df")

    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
    // the hot key's stamped size is the planted population
    assert(viaHelper.filter($"g1" === "hot").agg(min("df"), max("df"))
      .as[(Long, Long)].head() == ((5000L, 5000L)))
  }

  test("withKeyCount == window count on a composite key with a hot bucket") {
    // The (band, bh) / packed-bk shape: one degenerate bucket (a
    // solid-color image class) plus scattered small buckets.
    val rows = (1 to 4000).map(i => (3, 0xBEEFL, i.toLong)) ++
      (1 to 150).map(k => (k % 8, k.toLong, (50000 + k).toLong))
    val df = rows.toDF("band", "bh", "doc_id")

    val viaHelper = BandIndex.withKeyCount(df, Seq("band", "bh"), "bsz")
      .select("doc_id", "band", "bh", "bsz")
    val viaWindow = df.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy("band", "bh")))
      .select("doc_id", "band", "bh", "bsz")

    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
    assert(viaHelper.filter($"band" === 3 && $"bh" === 0xBEEFL)
      .agg(min("bsz"), max("bsz")).as[(Long, Long)].head() == ((4000L, 4000L)))
  }

  test("withKeyCount keeps null-key rows (the window's null group): " +
    "empty-shingle docs carry null band hashes, and the join-back must " +
    "count them as one group, not drop them") {
    val rows: Seq[(Integer, java.lang.Long)] =
      Seq[(Integer, java.lang.Long)]((null, 1L), (null, 2L), (null, 3L)) ++
        (1 to 5).map(i => (Integer.valueOf(i % 2), java.lang.Long.valueOf(100L + i)))
    val df = rows.toDF("bh", "doc_id")
    val viaHelper = BandIndex.withKeyCount(df, Seq("bh"), "bsz")
      .select("bh", "doc_id", "bsz")
    val viaWindow = df.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy("bh")))
      .select("bh", "doc_id", "bsz")
    assert(viaHelper.count() == 8L, "null-key rows must survive the join-back")
    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
  }

  test("withKeyCount plan has no window operator") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i.toLong)).toDF("g1", "doc_id")
    val plan = BandIndex.withKeyCount(df, Seq("g1"), "df")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected partial agg in plan:\n$plan")
  }
}
