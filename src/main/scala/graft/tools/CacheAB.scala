package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B harness reproducing the bench sequence for the dedup pair:
  * warm codegen at sf0.001, build the shingle cache via q_doc_dedup at
  * sf0.1, then time q_dedup_clusters at sf0.1 — isolates which stage of
  * the bench context regresses.
  */
object CacheAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs rows=$n")
    }
    val q = graft.Registry.queryMap
    t("warm doc_dedup sf0.001")(q("q_doc_dedup")(spark, "/root/testdata/sf0.001").count())
    t("warm clusters sf0.001")(q("q_dedup_clusters")(spark, "/root/testdata/sf0.001").count())
    t("doc_dedup sf0.1")(q("q_doc_dedup")(spark, "/root/testdata/sf0.1").count())
    t("clusters sf0.1")(q("q_dedup_clusters")(spark, "/root/testdata/sf0.1").count())
    t("clusters sf0.1 again")(q("q_dedup_clusters")(spark, "/root/testdata/sf0.1").count())
    spark.stop()
  }
}
