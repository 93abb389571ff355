package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored span artifact's lifecycle: build (bucketed rows + counts,
  * nd precomputed), daily append (batch-local nd lower bound — a span
  * straddling standing corpus and batch surfaces only after refresh),
  * periodic refresh (exact counts, equal to a from-scratch rebuild).
  */
class SpanSetSpec extends SparkSpec {
  import spark.implicits._

  // docs 1/2 share their first 9 tokens -> 2 duplicated 8-gram spans
  private val sharedA = "one two three four five six seven eight nine ten"
  private val sharedB = "one two three four five six seven eight nine zzz"
  private val lonely = "aa bb cc dd ee ff gg hh ii jj"

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text").withColumn("source", lit("s0"))

  private def dropAll(tag: String): Unit =
    Seq(s"${tag}_spanrows", s"${tag}_spanset").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("buildOrLoad materializes bucketed tables; duplicatedSpans applies " +
    "the stored-nd threshold") {
    val tag = "graft_test_ss_build"
    dropAll(tag)
    val (rows, set) = SpanSet.buildOrLoad(spark,
      docs(1L -> sharedA, 2L -> sharedB, 3L -> lonely), tag)
    // 9 shared tokens -> 2 shared 8-gram spans; each doc has 3 distinct
    // spans (10 tokens) except doc 3 (10 tokens -> 3 spans)
    assert(rows.count() == 9)
    assert(set.filter(col("nd") >= 2).count() == 2)
    val dup = SpanSet.duplicatedSpans(spark, tag)
    assert(dup.count() == 2)
    // agrees with the in-memory derivation, fingerprint for fingerprint
    val mem = SpanDedup.duplicatedSpanSet(docs(1L -> sharedA, 2L -> sharedB,
      3L -> lonely)).as[String].collect().sorted.toSeq
    assert(dup.as[String].collect().sorted.toSeq == mem)
    // a second call is a catalog hit: no rebuild, same data
    val (_, set2) = SpanSet.buildOrLoad(spark, spark.emptyDataFrame, tag)
    assert(set2.count() == set.count())
    dropAll(tag)
  }

  test("randomized differential: stored duplicated set equals the " +
    "in-memory derivation on a seeded random corpus") {
    val rnd = new scala.util.Random(13)
    // binary vocabulary: only 2^8 = 256 possible 8-gram spans, so 60
    // random docs collide densely — genuine random collisions, not a
    // handcrafted fixture
    val vocab = Vector("aa", "bb")
    val corpus = (1L to 60L).map { i =>
      (i, Seq.fill(8 + rnd.nextInt(7))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val tag = "graft_test_ss_rand"
    dropAll(tag)
    SpanSet.buildOrLoad(spark, docs(corpus: _*), tag)
    val stored = SpanSet.duplicatedSpans(spark, tag)
      .as[String].collect().sorted.toSeq
    val mem = SpanDedup.duplicatedSpanSet(docs(corpus: _*))
      .as[String].collect().sorted.toSeq
    assert(stored.nonEmpty, "random corpus produced no duplicated spans — " +
      "differential has no teeth")
    assert(stored == mem)
    dropAll(tag)
  }

  test("append is a batch-local lower bound; refresh merges counts exactly") {
    val tagA = "graft_test_ss_maint"
    val tagB = "graft_test_ss_rebuilt"
    dropAll(tagA); dropAll(tagB)
    SpanSet.buildOrLoad(spark, docs(1L -> sharedA, 3L -> lonely), tagA)
    // standing corpus has no duplicated span yet
    assert(SpanSet.duplicatedSpans(spark, tagA).count() == 0)
    // batch doc 10 shares doc 1's spans — but the appended counts are
    // batch-local (nd=1), so the straddling span is NOT yet surfaced
    SpanSet.append(spark, docs(10L -> sharedB), tagA)
    assert(spark.table(s"${tagA}_spanrows").count() == 9)
    assert(SpanSet.duplicatedSpans(spark, tagA).count() == 0,
      "append must not claim exactness — straddling spans wait for refresh")
    // refresh recomputes exact counts from the stored rows: now equal to
    // a from-scratch rebuild over the merged corpus, row for row
    SpanSet.refreshSpanCounts(spark, tagA)
    assert(SpanSet.duplicatedSpans(spark, tagA).count() == 2)
    val rebuilt = SpanSet.buildOrLoad(spark,
      docs(1L -> sharedA, 3L -> lonely, 10L -> sharedB), tagB)._2
    val refreshed = spark.table(s"${tagA}_spanset")
    assert(refreshed.except(rebuilt).isEmpty && rebuilt.except(refreshed).isEmpty,
      "refreshed span set must equal a from-scratch rebuild")
    dropAll(tagA); dropAll(tagB)
  }
}
