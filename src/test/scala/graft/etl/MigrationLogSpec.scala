package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import scala.jdk.CollectionConverters._

class MigrationLogSpec extends SparkSpec {

  test("migrate writes per-table and FK progress lines to the log file (F2)") {
    val src = Files.createTempDirectory("graft_log_src")
    val out = Files.createTempDirectory("graft_log_out")
    val logFile = Files.createTempFile("graft_migration", ".log")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$src/t1.parquet")
    Seq((1L, 10L)).toDF("pid", "ref")
      .write.mode("overwrite").parquet(s"$src/t2.parquet")

    Pipeline.migrate(spark, Pipeline.SourceConfig(src.toString),
      out.toString,
      foreignKeys = Seq(Pipeline.ForeignKey("t2", "pid", "t1", "id")),
      log = MigrationLog.toFile(logFile))

    val lines = Files.readAllLines(logFile).asScala.toSeq
    val cells = lines.map(_.split("\t").toSeq)
    // structured: ts level table phase message
    assert(cells.forall(_.size == 5))
    assert(cells.exists(c => c(2) == "t1" && c(4).startsWith("start")))
    assert(cells.exists(c => c(2) == "t1" && c(3) == "write" && c(4).startsWith("done")))
    assert(cells.exists(c => c(2) == "t2" && c(3).startsWith("fk t2.pid->t1.id")))
    assert(cells.exists(c => c(2) == "*" && c(4).startsWith("all done")))
    // timestamps parse as ISO-8601 instants
    cells.foreach(c => java.time.Instant.parse(c.head))
  }
}
