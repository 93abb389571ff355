package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored PQ artifact's lifecycle: build (codebook + bucketed codes,
  * identical to the inline derivation), ingest append (encode against
  * the EXISTING codebook — the documented staleness bound), rebuild
  * (the only honest PQ refresh: codes are lossy).
  */
class PqStoreSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def dropAll(tag: String): Unit =
    Seq(s"${tag}_pqcodebook", s"${tag}_pqcodes").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  test("stored codebook/codes equal the inline derivation; geometry and " +
    "audit sane") {
    val tag = PqStore.tag(dir)
    dropAll(tag)
    val (cb, codes) = PqStore.buildOrLoad(spark, dir)
    assert(cb.count() == SimilarityQueries.PqM * SimilarityQueries.PqK)
    val n = SimilarityQueries.normalizedCorpus(spark, dir)
    val inline = SimilarityQueries.encodePq(
      n, SimilarityQueries.buildPqCodebook(n))
    assert(codes.select("vec_id", "codes")
      .except(inline.select("vec_id", "codes")).isEmpty &&
      inline.select("vec_id", "codes")
        .except(codes.select("vec_id", "codes")).isEmpty,
      "stored codes must equal the inline encode")
    // every vector carries exactly PqM codes in [1, PqK]
    val bad = codes.filter(size(col("codes")) =!= SimilarityQueries.PqM ||
      exists(col("codes"),
        c => c < 1 || c > SimilarityQueries.PqK)).count()
    assert(bad == 0)
    val (nVec, worstUsed) = PqStore.codeStats(spark, tag)
    assert(nVec == codes.count() && worstUsed >= 1 &&
      worstUsed <= SimilarityQueries.PqK)
    dropAll(tag)
  }

  test("append encodes against the existing codebook; rebuild retrains") {
    val tag = PqStore.tag(dir) + "_maint"
    dropAll(tag)
    val n = SimilarityQueries.normalizedCorpus(spark, dir)
    val cb = SimilarityQueries.buildPqCodebook(n)
    cb.write.saveAsTable(s"${tag}_pqcodebook")
    SimilarityQueries.encodePq(n, cb)
      .write.bucketBy(8, "vec_id").sortBy("vec_id")
      .saveAsTable(s"${tag}_pqcodes")
    val before = spark.table(s"${tag}_pqcodes").count()
    // a batch of two new vectors: one equal to an existing corpus
    // vector (must get ITS stored codes), one arbitrary
    val twin = n.orderBy("vec_id").limit(1)
      .select(col("vec_id").as[Long], col("v").as[Seq[Double]]).collect()(0)
    val arb = Seq.fill(twin._2.length)(0.25)
    val batch = Seq((900001L, twin._2), (900002L, arb))
      .toDF("vec_id", "v")
      .withColumn("nrm",
        sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
    PqStore.append(spark, batch, tag)
    spark.catalog.refreshTable(s"${tag}_pqcodes")
    val after = spark.table(s"${tag}_pqcodes")
    assert(after.count() == before + 2)
    val twinCodes = after.filter(col("vec_id") === twin._1)
      .select("codes").as[Seq[Int]].collect()(0)
    val appended = after.filter(col("vec_id") === 900001L)
      .select("codes").as[Seq[Int]].collect()(0)
    assert(appended == twinCodes,
      "identical vector must encode to identical codes under the " +
        "standing codebook")
    dropAll(tag)
  }

  test("delete (r15 verdict #1): the codes table is exact immediately " +
    "— post-delete it equals encodePq(survivors, codebook) row for " +
    "row, a deleted vector can never reach an ADC shortlist, and the " +
    "codebook is untouched (retraining is rebuild, the class contract)") {
    val tag = PqStore.tag(dir) + "_del"
    dropAll(tag)
    val n = SimilarityQueries.normalizedCorpus(spark, dir)
    val cb = SimilarityQueries.buildPqCodebook(n)
    cb.write.saveAsTable(s"${tag}_pqcodebook")
    SimilarityQueries.encodePq(n, cb)
      .write.bucketBy(8, "vec_id").sortBy("vec_id")
      .saveAsTable(s"${tag}_pqcodes")
    val cbBefore = spark.table(s"${tag}_pqcodebook").collect().toSet
    val victims = n.orderBy("vec_id").limit(3)
      .select("vec_id").as[Long].collect().toSeq
    val removed = PqStore.delete(spark,
      (victims :+ 999999L).toDF("vec_id"), tag)
    assert(removed == 3L, s"got $removed")
    val after = spark.table(s"${tag}_pqcodes")
    assert(after.filter(col("vec_id").isin(victims: _*)).count() == 0,
      "deleted vectors' codes must be gone — nothing to shortlist")
    // exact differential: == encoding the survivors under the SAME
    // codebook (rebuild would retrain — a different, documented verb)
    val expect = SimilarityQueries.encodePq(
      n.filter(!col("vec_id").isin(victims: _*)), cb)
    assert(after.select("vec_id", "codes")
      .except(expect.select("vec_id", "codes")).isEmpty &&
      expect.select("vec_id", "codes")
        .except(after.select("vec_id", "codes")).isEmpty,
      "post-delete codes must equal encodePq over the survivors")
    assert(spark.table(s"${tag}_pqcodebook").collect().toSet == cbBefore,
      "delete must not touch the codebook")
    assert(PqStore.delete(spark, victims.toDF("vec_id"), tag) == 0L)
    dropAll(tag)
  }
}
