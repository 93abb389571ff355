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

  // ---- withKeyAgg (r17 verdict #1): the generalized form the
  // declared-query migrations use. One differential per migrated
  // window shape, each with a planted Zipf-head key.

  test("withKeyAgg min == window min on a planted hot fingerprint " +
    "(the funnel exact-dup keeper shape)") {
    val rows = (1 to 3000).map(i => ("fp_boilerplate", i + 100L)) ++
      (1 to 100).map(k => (s"fp_$k", k.toLong))
    val df = rows.toDF("fp", "doc_id")
    val viaHelper = BandIndex.withKeyAgg(df, Seq("fp"),
        Seq(min(col("doc_id")).as("keeper_id")))
      .select("fp", "doc_id", "keeper_id")
    val viaWindow = df.withColumn("keeper_id",
        min(col("doc_id")).over(Window.partitionBy("fp")))
      .select("fp", "doc_id", "keeper_id")
    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
    assert(viaHelper.filter($"fp" === "fp_boilerplate")
      .agg(min("keeper_id"), max("keeper_id"))
      .as[(Long, Long)].head() == ((101L, 101L)))
  }

  test("withKeyAgg count+min multi-agg == the simhash cluster window " +
    "pair on a planted hot fingerprint class") {
    val rows = (1 to 2500).map(i => ("1010", 1000L + i)) ++
      (1 to 80).map(k => (f"$k%04d", k.toLong))
    val df = rows.toDF("simhash", "doc_id")
    val viaHelper = BandIndex.withKeyAgg(df, Seq("simhash"),
        Seq(count(lit(1)).as("cluster_size"),
          min("doc_id").as("cluster_min")))
      .select("doc_id", "simhash", "cluster_size", "cluster_min")
    val w = Window.partitionBy("simhash")
    val viaWindow = df.select(col("doc_id"), col("simhash"),
      count(lit(1)).over(w).as("cluster_size"),
      min("doc_id").over(w).as("cluster_min"))
    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
  }

  test("argmax-struct election off withKeyAgg == row_number window " +
    "rank-1 drop (the funnel near-dup shape), qp ties broken by min " +
    "doc_id") {
    // One mega-cluster with a qp tie at the top + small clusters.
    val rows = (1 to 2000).map(i =>
      (7L, 100L + i, if (i <= 2) 3 else i % 3)) ++
      (1 to 50).map(k => (k.toLong * 1000, k.toLong, k % 4))
    val df = rows.toDF("cluster_id", "doc_id", "qp")
    val best = df.groupBy("cluster_id")
      .agg(max(struct(col("qp"), (-col("doc_id")).as("nd"))).as("best"))
      .select(col("cluster_id"), (-col("best.nd")).as("keeper_doc"))
    val viaAgg = df.join(best, "cluster_id")
      .filter($"doc_id" =!= $"keeper_doc").select("doc_id")
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("qp").desc, col("doc_id").asc)))
      .filter($"rn" > 1).select("doc_id")
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
    // the tie at the top of the mega-cluster elects the SMALLER doc_id
    assert(best.filter($"cluster_id" === 7L).select("keeper_doc")
      .as[Long].head() == 101L)
  }

  test("capped-bucket filter off withKeyCount == the window-counted " +
    "cap (the candidateJaccard / simhashHammingPairs shape): planted " +
    "hot bucket skipped, singletons skipped, mid buckets kept") {
    val cap = 64
    val rows = (1 to 500).map(i => (0, 0xB01L, 1000L + i)) ++ // hot: skip
      (1 to 10).map(i => (1, 0x222L, 2000L + i)) ++ // mid: keep
      Seq((2, 0x333L, 3000L)) // singleton: skip
    val df = rows.toDF("band", "bh", "doc_id")
    val viaHelper = BandIndex.withKeyCount(df, Seq("band", "bh"), "bsz")
      .filter($"bsz" > 1 && $"bsz" <= cap).select("doc_id", "band", "bh")
    val viaWindow = df.withColumn("bsz",
        count(lit(1)).over(Window.partitionBy("band", "bh")))
      .filter($"bsz" > 1 && $"bsz" <= cap).select("doc_id", "band", "bh")
    assert(viaHelper.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaHelper).isEmpty)
    assert(viaHelper.count() == 10L)
  }

  test("withKeyCount plan has no window operator") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i.toLong)).toDF("g1", "doc_id")
    val plan = BandIndex.withKeyCount(df, Seq("g1"), "df")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected partial agg in plan:\n$plan")
  }
}
