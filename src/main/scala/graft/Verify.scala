package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The session every correctness main shares ([[Verify]],
    * [[DriftSweep]]): warehouse pinned off-cwd, UTC, quiet UI.
    */
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // Stored artifacts (BandIndex bucketed tables) land in the SQL
      // warehouse; pin it to an absolute writable path so the run does
      // not depend on the harness's cwd.
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local fast iteration;
    // the driver always calls with 2 args = full set).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = session()
    run(spark, sfDir, outDir, only)
    spark.stop()
  }

  /** Dump every (selected) declared query's result at `sfDir` under
    * `outDir`, plus oracle_sql.json — callable per scale so
    * [[DriftSweep]] sweeps three scales in one JVM.
    */
  private[graft] def run(spark: SparkSession, sfDir: String, outDir: String,
                         only: Option[Set[String]] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    // Sorted order + per-family cache release after the last consumer
    // (same hygiene as Bench): the full 72-query dump otherwise holds
    // every shared persisted family simultaneously.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => only.forall(_.contains(name)))
    val releaseAfter = ops.SharedCaches.releasePoints(names)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      releaseAfter.getOrElse(name, Nil).foreach(ops.SharedCaches.release)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
