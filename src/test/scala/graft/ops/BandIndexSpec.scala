package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored MinHash index's lifecycle: build (bucketed tables,
  * precomputed bucket sizes), daily append (batch-local bsz lower
  * bound), periodic refresh (exact bsz, equal to a from-scratch
  * rebuild).
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  private val copyText =
    "the quick brown fox jumps over the lazy dog tonight again"
  private val otherText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  private def dropAll(tag: String): Unit =
    Seq(s"${tag}_shingles", s"${tag}_bands").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("buildOrLoad materializes bucketed tables with precomputed bucket sizes") {
    val tag = "graft_test_bi_build"
    dropAll(tag)
    val docs = Seq((1L, copyText), (2L, copyText), (3L, otherText))
      .toDF("doc_id", "text")
    val (sh, bd) = BandIndex.buildOrLoad(spark, docs, tag)
    assert(sh.count() == 3)
    // docs 1,2 identical -> every one of doc 1's buckets has size 2
    val bsz1 = bd.filter(col("doc_id") === 1L).select("bsz").as[Long].collect()
    assert(bsz1.nonEmpty && bsz1.forall(_ == 2L), bsz1.toSeq.toString)
    val bsz3 = bd.filter(col("doc_id") === 3L).select("bsz").as[Long].collect()
    assert(bsz3.nonEmpty && bsz3.forall(_ == 1L), bsz3.toSeq.toString)
    // a second call is a catalog hit: no rebuild, same data
    val (_, bd2) = BandIndex.buildOrLoad(spark,
      spark.emptyDataFrame, tag) // input unused on the load path
    assert(bd2.count() == bd.count())
    dropAll(tag)
  }

  test("append adds a batch in place; refresh restores exact bucket sizes") {
    val tagA = "graft_test_bi_maint"
    val tagB = "graft_test_bi_rebuilt"
    dropAll(tagA); dropAll(tagB)
    val standing = Seq((1L, copyText), (2L, otherText)).toDF("doc_id", "text")
    BandIndex.buildOrLoad(spark, standing, tagA)
    val batch = Seq((10L, copyText)).toDF("doc_id", "text") // near-dup of doc 1
    BandIndex.append(spark, batch, tagA)
    assert(spark.table(s"${tagA}_shingles").count() == 3)
    // the appended doc's bands land in doc 1's buckets, so a band-key
    // join (what the incremental/stream probe does) now pairs them
    val bd = spark.table(s"${tagA}_bands")
    val paired = bd.filter(col("doc_id") === 1L).select("band", "bh")
      .join(bd.filter(col("doc_id") === 10L).select("band", "bh"),
        Seq("band", "bh"))
    assert(paired.count() == 3, "copy must collide in all 3 bands")
    // appended rows carry the batch-local (lower-bound) bsz...
    assert(bd.filter(col("doc_id") === 10L).select("bsz").as[Long]
      .collect().forall(_ == 1L))
    // ...and refresh recomputes exact sizes: table now equals a
    // from-scratch rebuild over the merged corpus, row for row
    BandIndex.refreshBucketSizes(spark, tagA)
    val rebuilt = BandIndex.buildOrLoad(spark, standing.union(batch), tagB)._2
      .select("doc_id", "band", "bh", "bsz")
    val refreshed = spark.table(s"${tagA}_bands")
      .select("doc_id", "band", "bh", "bsz")
    assert(refreshed.except(rebuilt).isEmpty && rebuilt.except(refreshed).isEmpty,
      "refreshed index must equal a from-scratch rebuild")
    dropAll(tagA); dropAll(tagB)
  }
}
