package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files
import java.security.MessageDigest

/** q_shuffle_shard — the deterministic training-order contract: gpos is
  * a permutation, shard-major (shard, pos) order IS the global md5
  * order (shards are key ranges), and the whole assignment is
  * layout-independent (the reason it exists: rand()/repartition orders
  * are not).
  */
class ShuffleShardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-shuffle").toString
    (1L to 200L).map(i => (i, s"doc $i", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("gpos is the exact global md5 permutation, assembled shard-major") {
    val rows = Registry.queryMap("q_shuffle_shard")(spark, dir)
      .select("doc_id", "shard", "pos", "gpos")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 200)
    // gpos is a permutation of 1..n
    assert(rows.map(_._4).sorted.toSeq == (1L to 200L))
    // reference permutation: order by (md5(doc_id), doc_id)
    val ref = (1L to 200L).sortBy(id => (md5hex(id.toString), id))
    val byGpos = rows.sortBy(_._4).map(_._1).toSeq
    assert(byGpos == ref, "gpos order != global md5 order")
    // shard is the key's leading hex digit -> shards are key RANGES,
    // so (shard, pos) lexicographic equals gpos order
    rows.foreach { case (id, shard, _, _) =>
      assert(shard == Integer.parseInt(md5hex(id.toString).take(1), 16))
    }
    val byShardPos = rows.sortBy(t => (t._2, t._3)).map(_._1).toSeq
    assert(byShardPos == ref, "shard-major read != global order")
    // per-shard pos is contiguous from 1
    rows.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length), s"shard $s")
    }
  }

  test("assignment is layout-independent: same result at any partitioning") {
    val a = Registry.queryMap("q_shuffle_shard")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Registry.queryMap("q_shuffle_shard")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }
}
