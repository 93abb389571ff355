package graft.etl

/** Migration report (F1) — the reference prints per-phase wall times,
  * per-table row counts & rows/sec, skipped tables/columns and a
  * "Column Conversions" section (ETLAlchemySource.py::print_timings
  * ~L1500-1600). Ours is a value the caller can render or assert on.
  */
final case class Report(
    tables: Seq[Pipeline.TableResult],
    fks: Seq[Report.FkResult],
    totalSeconds: Double,
    artifacts: Seq[Report.ArtifactResult] = Nil) {

  def rowsMigrated: Long = tables.filterNot(_.skipped).map(_.rowsOut).sum
  def skippedTables: Seq[String] = tables.filter(_.skipped).map(_.table)
  def violatedFks: Seq[Report.FkResult] = fks.filter(_.orphanCount > 0)

  /** Artifact rows where a cap silently dropped data — the pipeline's
    * "no silent caps" contract: anything skipped must be visible here.
    */
  def cappedArtifacts: Seq[Report.ArtifactResult] =
    artifacts.filter(_.skippedBuckets > 0)

  def render: String = {
    val sb = new StringBuilder
    sb.append("== Migration report ==\n")
    sb.append(f"total wall: $totalSeconds%.2fs  rows: $rowsMigrated%d\n")
    sb.append("-- tables --\n")
    tables.sortBy(_.table).foreach { t =>
      val rate = if (t.wallSeconds > 0) t.rowsOut / t.wallSeconds else 0.0
      val status = if (t.skipped) "SKIPPED(empty)" else f"$rate%.0f rows/s"
      sb.append(f"  ${t.table}%-12s -> ${t.outputName}%-12s ${t.rowsOut}%8d rows  $status%s\n")
      t.droppedColumns.foreach(c => sb.append(s"    dropped all-null column: $c\n"))
      t.conversions.foreach(cl =>
        sb.append(s"    converted ${cl.column}: ${cl.from} -> ${cl.to.simpleString} (${cl.reason})\n"))
    }
    if (fks.nonEmpty) {
      sb.append("-- foreign keys --\n")
      fks.foreach(fk =>
        sb.append(s"  ${fk.edge}: ${if (fk.orphanCount == 0) "OK" else s"${fk.orphanCount} ORPHANS"}\n"))
    }
    if (artifacts.nonEmpty) {
      sb.append("-- artifacts --\n")
      artifacts.foreach { a =>
        val cap = if (a.skippedBuckets > 0)
          s"  CAPPED(${a.skippedBuckets} buckets/${a.skippedRows} rows)"
        else ""
        sb.append(f"  ${a.table}%-12s ${a.kind}%-10s ${a.wallSeconds}%.2fs  ${a.detail}%s$cap%s\n")
      }
    }
    sb.result()
  }
}

object Report {
  final case class FkResult(edge: String, orphanCount: Long)

  /** One post-load artifact build: what was built, how long, and what
    * any cap silently skipped (0/0 = nothing capped).
    */
  final case class ArtifactResult(table: String, kind: String,
                                  detail: String, skippedBuckets: Long,
                                  skippedRows: Long, wallSeconds: Double)
}
