package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stored media-signature artifact lifecycle: build, append, and the
  * shared probe — the BandIndex conventions on the media column.
  */
class MediaSigStoreSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Seq[Long]) = ids.toDF("doc_id")

  test("probe finds planted twins of a standing corpus; append extends it") {
    val tag = "graft_test_msig_" + System.nanoTime()
    // standing: group g=3 members 3, 197 (unperturbed) + disjoint 7
    MediaSigStore.buildOrLoad(spark, docs(Seq(3L, 7L, 197L)), tag,
      ImageDedup.dhashSigs)
    // arriving: 100 is group-3's perturbed twin; 50 is a fresh group
    val batch = ImageDedup.dhashSigs(docs(Seq(100L, 50L)))
    val hits = MediaSigStore.probe(spark, batch, tag, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(hits.map(h => (h._1, h._2)) == Seq((100L, 3L), (100L, 197L)))
    assert(hits.forall(_._3 <= 2L))
    // append the arrivals: a later twin of 50's group now matches it
    MediaSigStore.append(spark, docs(Seq(100L, 50L)), tag, ImageDedup.dhashSigs)
    val batch2 = ImageDedup.dhashSigs(docs(Seq(147L))) // 147 % 97 = 50
    val hits2 = MediaSigStore.probe(spark, batch2, tag, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSeq
    // 147 % 97 = 50: matches only the (perturbed) appended doc 50
    assert(hits2.map(h => (h._1, h._2)) == Seq((147L, 50L)))
    assert(hits2.head._3 <= 2L)
  }

  test("randomized differential: probe == brute-force banded Hamming") {
    val rnd = new scala.util.Random(23)
    val standingIds = Seq.fill(40)(rnd.nextInt(400).toLong).distinct
    val batchIds = Seq.fill(15)(rnd.nextInt(400).toLong).distinct
    val tag = "graft_test_msdiff_" + System.nanoTime()
    MediaSigStore.buildOrLoad(spark, docs(standingIds), tag,
      ImageDedup.dhashSigs)
    val got = MediaSigStore.probe(spark,
      ImageDedup.dhashSigs(docs(batchIds)), tag, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the signature contract: a (batch, standing) pair
    // is emitted iff some band matches exactly AND total Hamming <= T
    def sig(id: Long) = ImageDedup.dhashBands(ImageDedup.renderPng(id)).get
    val exp = (for {
      b <- batchIds; s <- standingIds if b != s
      sb = sig(b); ss = sig(s)
      bandHit = Seq(sb._1 == ss._1, sb._2 == ss._2, sb._3 == ss._3,
        sb._4 == ss._4).exists(identity)
      ham = java.lang.Integer.bitCount(sb._1 ^ ss._1) +
        java.lang.Integer.bitCount(sb._2 ^ ss._2) +
        java.lang.Integer.bitCount(sb._3 ^ ss._3) +
        java.lang.Integer.bitCount(sb._4 ^ ss._4)
      if bandHit && ham <= ImageDedup.HamT
    } yield (b, s, ham.toLong)).toSet
    assert(got == exp)
    assert(exp.nonEmpty, "differential should exercise real matches")
  }

  test("delete (r15 verdict #1, the append dual): a deleted item is " +
    "never matched again — immediately, pre-refresh — surviving bsz " +
    "upper-bounds, and delete + refreshBucketSizes makes probe == a " +
    "from-scratch rebuild over the survivors") {
    val tagA = "graft_test_msdel_" + System.nanoTime()
    val tagB = "graft_test_msdelref_" + System.nanoTime()
    // standing: twins 3 and 197 (group 3) + disjoint 7; delete 3
    MediaSigStore.buildOrLoad(spark, docs(Seq(3L, 7L, 197L)), tagA,
      ImageDedup.dhashSigs)
    val (sR, bR) = MediaSigStore.delete(spark,
      Seq(3L, 999L).toDF("doc_id"), tagA)
    assert(sR == 1L && bR == 4L, s"got ($sR, $bR)")
    // the takedown guarantee pre-refresh: the probe of group-3's
    // perturbed twin sees only the SURVIVING twin 197
    val batch = ImageDedup.dhashSigs(docs(Seq(100L)))
    val hits = MediaSigStore.probe(spark, batch, tagA, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits.map(h => (h._1, h._2)) == Seq((100L, 197L)),
      s"probe must see only the survivor: $hits")
    // surviving band rows keep the pre-delete bucket population (a
    // stale upper bound); the re-level restores exactness: probe ==
    // the rebuild-over-survivors' probe
    MediaSigStore.refreshBucketSizes(spark, tagA)
    MediaSigStore.buildOrLoad(spark, docs(Seq(7L, 197L)), tagB,
      ImageDedup.dhashSigs)
    val pa = MediaSigStore.probe(spark, batch, tagA, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSet
    val pb = MediaSigStore.probe(spark, batch, tagB, ImageDedup.HamT)
      .as[(Long, Long, Long)].collect().toSet
    assert(pa == pb, "probe must equal the rebuild over survivors")
    // ...and the tables themselves agree
    for (suffix <- Seq("_msig", "_mband")) {
      val a = spark.table(s"$tagA$suffix")
      val b = spark.table(s"$tagB$suffix")
      assert(a.except(b).isEmpty && b.except(a).isEmpty,
        s"$suffix must equal the rebuild over survivors")
    }
    assert(MediaSigStore.delete(spark, Seq(3L).toDF("doc_id"), tagA) ==
      ((0L, 0L)))
  }

  test("streaming faces == the shared probe definition (image and audio)") {
    val imgTag = "graft_test_msimg_" + System.nanoTime()
    val audTag = "graft_test_msaud_" + System.nanoTime()
    MediaSigStore.buildOrLoad(spark, docs(Seq(3L, 197L)), imgTag,
      ImageDedup.dhashSigs)
    MediaSigStore.buildOrLoad(spark, docs(Seq(5L, 94L)), audTag,
      AudioDedup.levelSigs)
    val img = graft.streaming.MediaStream
      .imageProbeBatch(spark, docs(Seq(100L)), imgTag)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(img.map(_._1).distinct == Seq(100L) && img.size == 2)
    val aud = graft.streaming.MediaStream
      .audioProbeBatch(spark, docs(Seq(183L)), audTag) // 183 % 89 = 5
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(aud.map(_._1).distinct == Seq(183L) && aud.size == 2)
    assert(aud.forall(_._3 <= 2L))
    // video face (r12): same probe skeleton over the vidsig role
    val vidTag = "graft_test_msvid_" + System.nanoTime()
    MediaSigStore.buildOrLoad(spark, docs(Seq(3L, 104L)), vidTag,
      VideoDedup.videoSigs) // group 3 (mod 101): 3, 104
    val vid = graft.streaming.MediaStream
      .videoProbeBatch(spark, docs(Seq(205L)), vidTag) // 205 % 101 = 3
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(vid.map(_._1).distinct == Seq(205L) && vid.size == 2)
    assert(vid.forall(_._3 <= 2L))
  }

  test("refreshBucketSizesPartial (r17): only partitions holding " +
    "touched bk buckets rewrite — result == the full from-signatures " +
    "refresh row-for-row, untouched partitions byte-identical, ledger " +
    "reset, second pass a no-op") {
    import org.apache.spark.sql.functions.expr
    val tagP = "graft_test_msig_part" + System.nanoTime()
    val tagF = tagP + "f"
    // standing: three disjoint groups; append adds group-3's twin (its
    // ~4 bks touched, the rest untouched)
    val standing = Seq(3L, 7L, 50L, 197L)
    for (t <- Seq(tagP, tagF)) {
      MediaSigStore.buildOrLoad(spark, docs(standing), t,
        ImageDedup.dhashSigs)
      MediaSigStore.append(spark, docs(Seq(100L)), t, ImageDedup.dhashSigs)
    }
    val nb = MediaSigStore.buckets(spark, tagP)
    val touched = spark.table(s"${tagP}_mtouched")
      .select(expr(s"pmod(hash(bk), $nb)").cast("int")).distinct()
      .as[Int].collect().toSet
    val all = spark.table(s"${tagP}_mband")
      .select(col("pbk").cast("int")).distinct().as[Int].collect().toSet
    assert(touched.nonEmpty && (all -- touched).nonEmpty,
      s"fixture must leave untouched partitions: $touched of $all")
    def files(ks: Set[Int]): Map[String, (Long, Long)] = ks.flatMap { k =>
      val d = new java.io.File(s"spark-warehouse/${tagP}_mband/pbk=$k")
      Option(d.listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified()))
    }.toMap
    val before = files(all -- touched)
    assert(before.nonEmpty, "untouched partitions must have files")
    val nPbk = MediaSigStore.refreshBucketSizesPartial(spark, tagP)
    assert(nPbk == touched.size.toLong)
    assert(files(all -- touched) == before,
      "untouched partitions must be byte-identical")
    MediaSigStore.refreshBucketSizes(spark, tagF)
    def canon(t: String) = spark.table(s"${t}_mband")
      .select("bk", "doc_id", "bsz")
      .as[(Int, Long, Long)].collect().toSet
    assert(canon(tagP) == canon(tagF),
      "partial == full from-signatures refresh row-for-row")
    assert(spark.table(s"${tagP}_mtouched").count() == 0)
    assert(MediaSigStore.refreshBucketSizesPartial(spark, tagP) == 0L)
    (MediaSigStore.tables(tagP) ++ MediaSigStore.tables(tagF))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("mediaSigDeleteBatch (r17, r16 missing #2): streamed micro-batch " +
    "deletes == one batch delete on both tables under any split, the " +
    "probe face forgets the deleted ids immediately, and a replayed " +
    "micro-batch is a no-op") {
    val tagS = "graft_test_msdel_s" + System.nanoTime()
    val tagB = "graft_test_msdel_b" + System.nanoTime()
    // standing: twins 3 and 197 (same dhash group) + disjoint 7 and 50
    val standing = Seq(3L, 7L, 50L, 197L)
    MediaSigStore.buildOrLoad(spark, docs(standing), tagS,
      ImageDedup.dhashSigs)
    MediaSigStore.buildOrLoad(spark, docs(standing), tagB,
      ImageDedup.dhashSigs)
    // reference: one batch delete; streamed: two 1-id micro-batches
    MediaSigStore.delete(spark, docs(Seq(197L, 50L)), tagB)
    for (id <- Seq(197L, 50L))
      graft.streaming.MediaStream.mediaSigDeleteBatch(spark,
        docs(Seq(id)), tagS)
    def sigs(t: String) = spark.table(s"${t}_msig")
      .select("doc_id").as[Long].collect().toSet
    def bands(t: String) = spark.table(s"${t}_mband")
      .select("bk", "doc_id", "bsz")
      .as[(Int, Long, Long)].collect().toSet
    assert(sigs(tagS) == sigs(tagB) && sigs(tagS) == Set(3L, 7L))
    assert(bands(tagS) == bands(tagB))
    // serving receipt: 100 is group-3's twin — its probe may match 3
    // but can never emit the deleted 197
    val got = graft.streaming.MediaStream
      .imageProbeBatch(spark, docs(Seq(100L)), tagS)
      .select("match_id").as[Long].collect().toSet
    assert(!got.contains(197L) && got.contains(3L), s"got $got")
    // idempotent replay
    assert(graft.streaming.MediaStream.mediaSigDeleteBatch(spark,
      docs(Seq(197L)), tagS) == ((0L, 0L)))
    (MediaSigStore.tables(tagS) ++ MediaSigStore.tables(tagB))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
