package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

/** F2: per-migration structured progress logging — the Spark mapping of
  * the reference's per-source log-file plumbing (`ETLAlchemySource.py::
  * __init__` ~L60-90: each source gets a dedicated logger writing
  * per-table progress lines to an optional file).
  *
  * Events append as tab-separated lines (ISO-8601 UTC timestamp, level,
  * table, phase, message) to the optional file and mirror to slf4j, so
  * cluster deployments get them in executor-driver logs even with no
  * file sink configured. Appends are synchronized: `Pipeline.migrate`
  * runs tables concurrently.
  */
final class MigrationLog(val logFile: Option[Path]) {
  private val slf = org.slf4j.LoggerFactory.getLogger("graft.migration")

  def event(level: String, table: String, phase: String, msg: String): Unit = {
    val ts = java.time.Instant.now().toString
    val line = s"$ts\t$level\t$table\t$phase\t$msg"
    if (level == "WARN") slf.warn(line) else slf.info(line)
    logFile.foreach { p =>
      synchronized {
        Files.writeString(p, line + "\n", StandardCharsets.UTF_8,
          StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      }
    }
  }

  def info(table: String, phase: String, msg: String): Unit =
    event("INFO", table, phase, msg)

  def warn(table: String, phase: String, msg: String): Unit =
    event("WARN", table, phase, msg)

  /** Run `f`, logging phase start and end-with-duration around it. */
  def timed[T](table: String, phase: String)(f: => T): T = {
    info(table, phase, "start")
    val t0 = System.nanoTime()
    val r = f
    info(table, phase, f"done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
    r
  }
}

object MigrationLog {
  /** slf4j-only (no file) — the default when callers pass no log_file. */
  val silent = new MigrationLog(None)

  def toFile(path: Path): MigrationLog = new MigrationLog(Some(path))
}
