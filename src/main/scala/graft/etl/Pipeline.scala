package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** The end-to-end migration pipeline — Spark-first re-expression of the
  * reference's full trace (SURVEY.md §3.1, ETLAlchemyTarget.py::migrate +
  * ETLAlchemySource.py::migrate):
  *
  *   reflect -> [per table] profile -> standardize -> schema rules ->
  *   write -> add_indexes (layout advice) -> add_fks (validation) -> report
  *
  * Key divergences from upstream, all deliberate and scale-driven:
  *   - tables run CONCURRENTLY (upstream is a serial Python loop; Spark's
  *     scheduler interleaves independent jobs submitted from Futures)
  *   - no whole-table driver materialization (upstream fetchall()s every
  *     table into RAM — its known scalability ceiling); everything stays
  *     partitioned on executors
  *   - staging is columnar parquet, not /tmp CSV; constraint phase becomes
  *     validation (anti-join orphan counts) since Spark has no FK DDL
  *   - deferred-constraint ordering (E3) is preserved: all writes finish
  *     before any FK validation runs.
  */
object Pipeline {

  final case class SourceConfig(
      dir: String,
      includedTables: Seq[String] = Nil, // empty = all (B7)
      excludedTables: Seq[String] = Nil,
      rules: Map[String, SchemaRules] = Map.empty, // per-table (B2-B5)
      tableRenames: Map[String, String] = Map.empty, // B6
      skipTableIfEmpty: Boolean = false, // B9
      skipColumnIfEmpty: Boolean = false, // B8
      compressVarchar: Boolean = false, // B10
      standardizeTypes: Boolean = true) // B1

  final case class ForeignKey(
      childTable: String, childCol: String,
      parentTable: String, parentCol: String)

  final case class TableResult(
      table: String,
      outputName: String,
      rowsIn: Long,
      rowsOut: Long,
      droppedColumns: Seq[String],
      conversions: Seq[TypeStandardizer.ConversionLog],
      skipped: Boolean,
      wallSeconds: Double)

  /** Discover tables in a directory of `<name>.parquet` (the analogue of
    * MetaData().reflect — parquet is self-describing, A2).
    */
  def reflectTables(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getName.stripSuffix(".parquet"))
      .sorted.toSeq
  }

  /** Migrate one table: profile (one pass) -> drop all-null cols (B8) ->
    * narrow types (B1/C1) -> apply schema rules (B2-B5) -> write parquet.
    */
  def migrateTable(
      spark: SparkSession,
      cfg: SourceConfig,
      table: String,
      outDir: String,
      log: MigrationLog = MigrationLog.silent): TableResult = {
    val t0 = System.nanoTime()
    val outName = cfg.tableRenames.getOrElse(table, table)
    log.info(table, "migrate", s"start -> $outName")
    val df = spark.read.parquet(s"${cfg.dir}/$table.parquet")
    val prof = Profiler.profile(df)

    if (cfg.skipTableIfEmpty && prof.rowCount == 0L) {
      log.info(table, "migrate", "skipped: empty table (B9)")
      return TableResult(table, outName, 0L, 0L, Nil, Nil, skipped = true,
        (System.nanoTime() - t0) / 1e9)
    }

    val allNull =
      if (cfg.skipColumnIfEmpty)
        prof.columns.filter(_.isAllNull(prof.rowCount)).map(_.name)
      else Nil
    val pruned = if (allNull.nonEmpty) df.drop(allNull: _*) else df

    val (standardized, conv) =
      if (cfg.standardizeTypes) TypeStandardizer.standardize(pruned, prof)
      else (pruned, Nil)

    val transformed =
      cfg.rules.get(table).map(_.apply(standardized)).getOrElse(standardized)

    log.timed(table, "write") {
      transformed.write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/$outName.parquet")
    }
    if (allNull.nonEmpty)
      log.info(table, "migrate", s"dropped all-null cols: ${allNull.mkString(",")}")
    log.info(table, "migrate", s"done rows=${prof.rowCount}")

    TableResult(table, outName, prof.rowCount, prof.rowCount,
      allNull, conv, skipped = false, (System.nanoTime() - t0) / 1e9)
  }

  /** Full migration: all tables concurrently, then deferred FK validation
    * (E2/E3). Returns the report (F1).
    */
  def migrate(
      spark: SparkSession,
      cfg: SourceConfig,
      outDir: String,
      foreignKeys: Seq[ForeignKey] = Nil,
      parallelism: Int = 4,
      log: MigrationLog = MigrationLog.silent): Report = {
    val t0 = System.nanoTime()
    val tables = reflectTables(cfg.dir)
      .filter(t => cfg.includedTables.isEmpty || cfg.includedTables.contains(t))
      .filterNot(cfg.excludedTables.contains)
    log.info("*", "migrate", s"${tables.size} tables: ${tables.mkString(",")}")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try Await.result(
        Future.sequence(tables.map(t =>
          Future(migrateTable(spark, cfg, t, outDir, log)))),
        Duration.Inf)
      finally pool.shutdown()

    // E3: constraints strictly after all loads.
    val fkResults = foreignKeys.map { fk =>
      val label =
        s"${fk.childTable}.${fk.childCol}->${fk.parentTable}.${fk.parentCol}"
      val orphans = log.timed(fk.childTable, s"fk $label") {
        Constraints.fkOrphanCount(
          spark.read.parquet(s"$outDir/${fk.childTable}.parquet"), fk.childCol,
          spark.read.parquet(s"$outDir/${fk.parentTable}.parquet"), fk.parentCol)
      }
      Report.FkResult(label, orphans)
    }
    log.info("*", "migrate", f"all done in ${(System.nanoTime() - t0) / 1e9}%.3fs")
    Report(results, fkResults, (System.nanoTime() - t0) / 1e9)
  }
}
