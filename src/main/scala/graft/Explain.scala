package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan and timed count for one
  * declared query. Usage: runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Registry.queryMap(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    // drive df's OWN query execution (so the adaptive plan below is its
    // final state) without materializing rows on the driver
    val n = df.queryExecution.toRdd.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $name: $n rows in $dt%.2fs")
    // AQE finalizes the plan during execution — print it afterwards so
    // runtime decisions (broadcast downgrades, stage/exchange reuse,
    // coalesced partitions) are visible, not just the static guess.
    println("[explain] final adaptive plan:")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
