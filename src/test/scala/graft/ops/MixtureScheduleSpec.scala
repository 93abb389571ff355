package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Deterministic mixture schedule: the stride-scheduling prefix-mix
  * guarantee (every key-prefix carries floor-exact per-source counts in
  * the target ratio) and layout-independence.
  */
class MixtureScheduleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("mixspec").toString
    // 30 docs of upweighted src0, 30 of plain src9
    val docs = ((1L to 30L).map(id => (id, s"doc $id", "src0")) ++
      (31L to 60L).map(id => (id, s"doc $id", "src9")))
      .map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  test("every schedule prefix carries the target 3:1 mix, floor-exact") {
    val rows = Registry.queryMap("q_mixture_schedule")(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    assert(rows.length == 60)
    // strides: src0 -> 1 (weight 3), src9 -> 3 (weight 1). Items of a
    // source with sched_key <= K: min(n_source, K / stride) exactly.
    for (k <- Seq(3L, 6L, 9L, 15L, 30L, 45L, 90L)) {
      val prefix = rows.filter(_._4 <= k)
      val up = prefix.count(_._2 == "src0")
      val plain = prefix.count(_._2 == "src9")
      assert(up == math.min(30L, k), s"K=$k src0")
      assert(plain == math.min(30L, k / 3), s"K=$k src9")
    }
    // total order is (key, source, doc_id) ascending
    val keys = rows.map(r => (r._4, r._2, r._1)).toSeq
    assert(keys == keys.sorted)
    // within a source, schedule follows the deterministic md5 rank
    val src0 = rows.filter(_._2 == "src0").sortBy(_._4).map(_._3).toSeq
    assert(src0 == (1L to 30L))
  }

  test("budget table ties to the schedule: last occurrence == exhaust_key") {
    val sched = Registry.queryMap("q_mixture_schedule")(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    val budget = Registry.queryMap("q_mixture_budget")(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(b => b._1 -> b).toMap
    // controlled corpus: src0 30 docs stride 1, src9 30 docs stride 3
    assert(budget("src0")._5 == 30L && budget("src9")._5 == 90L)
    assert(budget("src0")._6 == 3.0 && budget("src9")._6 == 1.0)
    for (src <- Seq("src0", "src9")) {
      val lastKey = sched.filter(_._2 == src).map(_._4).max
      assert(lastKey == budget(src)._5, s"$src exhaust")
    }
  }

  test("schedule is layout-independent: same output at other parallelism") {
    val a = Registry.queryMap("q_mixture_schedule")(spark, dir)
      .collect().map(_.toString).toSeq
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Registry.queryMap("q_mixture_schedule")(spark, dir)
        .collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
