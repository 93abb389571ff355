package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-bucket cap on the media band joins (r11 verdict #2): a
  * degenerate media class — every solid-color image hashes to ONE
  * dHash signature, so all its members land in the same four band
  * buckets — must be SKIPPED above the cap rather than expanded into
  * O(class²) candidate pairs. The planted class here is a group of
  * unperturbed same-group docs (identical signature by construction:
  * same group id ⇒ same rendered image ⇒ same bands).
  */
class MediaCapSpec extends SparkSpec {
  import spark.implicits._

  /** 40 doc_ids ≡ 2 (mod 97), none divisible by PerturbMod=5 — all
    * render the SAME image (group 2, unperturbed), one 40-deep bucket
    * per band. Plus a small 3-member group (ids ≡ 3 mod 97, also
    * unperturbed) that must survive any cap > 3.
    */
  private val hotIds: Seq[Long] =
    (0 until 60).map(k => 97L * k + 2).filter(_ % 5 != 0).take(40)
  private val coolIds: Seq[Long] =
    Seq(3L, 100L + 97L, 3L + 4 * 97L).filter(_ % 5 != 0).take(3)

  private def build(tag: String) =
    MediaSigStore.buildOrLoad(spark,
      (hotIds ++ coolIds).toDF("doc_id"), tag, ImageDedup.dhashSigs)

  test("planted solid class: identical signatures, 40-deep buckets") {
    val tag = "graft_test_mediacap_sanity_" + System.nanoTime()
    val (sigs, bands) = build(tag)
    assert(coolIds.size == 3 && coolIds.forall(_ % 97 == 3))
    val hotSigs = sigs.filter(col("doc_id").isin(hotIds: _*))
      .select("b0", "b1", "b2", "b3").distinct().count()
    assert(hotSigs == 1, "the hot class must share one signature")
    val maxB = bands.agg(max("bsz")).head().getLong(0)
    assert(maxB >= 40, s"hot buckets must be 40-deep, got $maxB")
  }

  test("hammingPairs: cap skips the hot class, keeps the cool one") {
    val tag = "graft_test_mediacap_pairs_" + System.nanoTime()
    val (sigs, bands) = build(tag)
    val capped = ImageDedup.hammingPairs(sigs, bands, cap = 8)
      .filter(col("hamming") <= ImageDedup.HamT)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the hot class generates ZERO pairs under the cap…
    assert(capped.forall { case (a, b) =>
      !(hotIds.contains(a) && hotIds.contains(b)) })
    // …while the small class's 3 pairs all survive
    val coolPairs = for {
      a <- coolIds; b <- coolIds if a < b
    } yield (a, b)
    assert(coolPairs.toSet.subsetOf(capped),
      s"cool-class pairs must survive the cap: $capped")
    // uncapped (default 256) the hot class explodes into 40*39/2 pairs
    val full = ImageDedup.hammingPairs(sigs, bands)
      .filter(col("hamming") <= ImageDedup.HamT).count()
    assert(full >= 40L * 39 / 2 + coolPairs.size)
  }

  test("probe: standing hot buckets skipped under the cap") {
    val tag = "graft_test_mediacap_probe_" + System.nanoTime()
    build(tag)
    // a twin of the hot class (same group, unperturbed)
    val twin = ImageDedup.dhashSigs(Seq(97L * 61 + 2).toDF("doc_id"))
    val capped = MediaSigStore.probe(spark, twin, tag,
      ImageDedup.HamT, cap = 8).count()
    assert(capped == 0, "hot-class probe must be capped")
    val uncapped = MediaSigStore.probe(spark, twin, tag,
      ImageDedup.HamT).count()
    assert(uncapped == 40, "default cap is inert for this corpus size")
  }

  test("audit reports exactly the over-cap buckets and rows") {
    val tag = "graft_test_mediacap_audit_" + System.nanoTime()
    build(tag)
    // 4 bands × one 40-deep bucket each = 4 buckets / 160 rows over a
    // cap of 8; the 3-member class is under every cap used here
    assert(MediaSigStore.hotBucketAudit(spark, tag, cap = 8) == (4L, 160L))
    assert(MediaSigStore.hotBucketAudit(spark, tag) == (0L, 0L),
      "default cap must be inert at test scale")
  }

  test("append stamps insert-time-exact bsz; refresh exacts all rows") {
    val tag = "graft_test_mediacap_refresh_" + System.nanoTime()
    build(tag)
    // append 2 more hot-class members: appended rows carry bsz =
    // standing + batch (42 — the bucket's TRUE size at insert time, so
    // cap crossings through appends bind immediately for new postings);
    // standing rows keep their build-vintage 40 until refresh — the
    // residual staleness errs toward keeping OLD rows only (r12 advice).
    MediaSigStore.append(spark,
      Seq(97L * 62 + 2, 97L * 63 + 2).toDF("doc_id"), tag,
      ImageDedup.dhashSigs)
    spark.catalog.refreshTable(s"${tag}_mband")
    val sizes = spark.table(s"${tag}_mband")
      .groupBy("bk").agg(max("bsz").as("mx"), min("bsz").as("mn"),
        count(lit(1)).as("n"))
    assert(sizes.filter(col("mx") =!= col("n")).count() == 0,
      "appended rows must carry the exact insert-time population")
    assert(sizes.filter(col("mn") < col("n")).count() > 0,
      "standing rows keep build-vintage bsz until refresh (the contract)")
    MediaSigStore.refreshBucketSizes(spark, tag)
    spark.catalog.refreshTable(s"${tag}_mband")
    val after = spark.table(s"${tag}_mband")
      .groupBy("bk").agg(max("bsz").as("mx"), min("bsz").as("mn"),
        count(lit(1)).as("n"))
    assert(after.filter(col("mx") =!= col("n") || col("mn") =!= col("n"))
      .count() == 0, "refresh must restore exact bucket populations")
  }
}
