package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc stage profiler for bench hot spots: times named sub-pipelines of a
  * declared query so regressions localize to a stage instead of a total.
  * Not part of the driver contract; run via
  *   sbt "runMain graft.tools.StageProfile <queryName> [sfDir]"
  */
object StageProfile {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3fs  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_doc_dedup")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    def run(label: String)(df: => DataFrame): Unit = time(label)(df.count())

    if (name == "q_doc_dedup_stages") {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.t(spark, dir, "documents")
      import graft.functions.TextFunctions._
      val sh = docs.select(col("doc_id"), normText(col("text")).as("nt"))
        .select(col("doc_id"), charShingles(col("nt"), 5).as("sh"))
      run("shingles")(sh.select(explode(col("sh"))))
      val sig = sh.select(col("doc_id"),
        graft.functions.MinHashSignature(col("sh"), 12).as("sig"))
      run("signature")(sig)
      run("signature again")(sig)
      val bands = sh.select(col("doc_id"),
        posexplode(graft.functions.MinHashBands(col("sh"), 3, 4))
          .as(Seq("band", "bh")))
      val pairs = bands.groupBy("band", "bh")
        .agg(collect_set(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
        .distinct()
      run("bands")(bands)
      run("bands again")(bands)
      val buckets = bands.groupBy("band", "bh")
        .agg(collect_set(col("doc_id")).as("ids"))
        .filter(size(col("ids")) > 1)
      run("buckets")(buckets)
      run("buckets again")(buckets)
      val pairsNoDistinct = buckets
        .select(explode(col("ids")).as("doc_a"), col("ids"))
        .select(col("doc_a"), explode(col("ids")).as("doc_b"))
        .filter(col("doc_a") < col("doc_b"))
      run("pairs nodistinct")(pairsNoDistinct)
      run("pairs nodistinct again")(pairsNoDistinct)
      run("pairs")(pairs)
      run("pairs again")(pairs)
      val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
      val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
      val full = pairs.join(a, "doc_a").join(b, "doc_b")
        .select(col("doc_a"), col("doc_b"), jaccard(col("sha"), col("shb")).as("j"))
        .filter(col("j") >= 0.6)
      run("full")(full)
      run("full again")(full)
    } else {
      // warm + full twice to separate codegen from steady-state
      run(s"$name cold")(graft.Registry.queryMap(name)(spark, dir))
      run(s"$name warm")(graft.Registry.queryMap(name)(spark, dir))
    }
    spark.stop()
  }
}
