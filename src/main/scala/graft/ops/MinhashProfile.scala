package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev tool (the [[graft.tools.StageProfile]] pattern, placed in ops for
  * access to the family's private stages): incremental timings of the
  * minhash family build — shingles, bands, capped self-join + Jaccard
  * verify, CC fixpoint, and the first-consumer query — so optimization
  * targets the stage that actually bills. Not part of the driver
  * contract; run via
  *   sbt "runMain graft.ops.MinhashProfile [sfDir]"
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    def time(label: String)(n: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = n
      println(f"[minhash] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$r")
    }
    // JMH-style warmup at the smallest SF (identical plan shapes →
    // codegen/JIT absorbed, the Bench protocol), then drop the warm
    // working set so the measured pass rebuilds its own.
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val wdocs = graft.Tables.par(spark, warm, "documents")
    DedupQueries.shingleRows(wdocs).count()
    DedupQueries.bandsFromShingles(DedupQueries.shingleRows(wdocs)).count()
    DedupQueries.minhashPairs(spark, warm).count()
    DedupQueries.minhashComponents(spark, warm).count()
    graft.Registry.queryMap("q_cluster_size_hist")(spark, warm).count()
    SharedCaches.release(SharedCaches.Minhash)
    spark.sharedState.cacheManager.clearCache()
    // un-persisted stage compute, cold each step (no cache reuse between
    // the first three lines — each re-derives its prefix, so the DELTAS
    // attribute stage cost)
    val docs = graft.Tables.par(spark, dir, "documents")
    time("tokenize+shingle")(DedupQueries.shingleRows(docs).count())
    time("+ minhash bands")(
      DedupQueries.bandsFromShingles(DedupQueries.shingleRows(docs)).count())
    // the family's real persisted chain (shingles+bands+cands persist,
    // capped self-join, Jaccard verify)
    time("persisted chain -> verified pairs")(
      DedupQueries.minhashPairs(spark, dir).count())
    time("verified pairs again (cached)")(
      DedupQueries.minhashPairs(spark, dir).count())
    // CC fixpoint on top (memoized labels)
    time("+ cc labels")(DedupQueries.minhashComponents(spark, dir).count())
    time("q_cluster_size_hist")(
      graft.Registry.queryMap("q_cluster_size_hist")(spark, dir).count())
    spark.stop()
  }
}
