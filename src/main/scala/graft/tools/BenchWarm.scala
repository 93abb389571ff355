package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs every declared query twice in one JVM and prints cold vs warm
  * seconds: the delta is the per-query codegen/JIT tax the one-shot bench
  * pays; the warm column is the steady-state cost to optimize for scale.
  */
object BenchWarm {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufflePartitions =
      sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cpus)
    val aqe = sys.env.getOrElse("GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    val rows = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      (name, cold, warm)
    }
    println(f"${"query"}%-28s ${"cold"}%8s ${"warm"}%8s ${"tax"}%8s")
    rows.sortBy(-_._2).foreach { case (n, c, w) =>
      println(f"$n%-28s $c%8.3f $w%8.3f ${c - w}%8.3f")
    }
    println(f"TOTAL cold=${rows.map(_._2).sum}%.2f warm=${rows.map(_._3).sum}%.2f")
    spark.stop()
  }
}
