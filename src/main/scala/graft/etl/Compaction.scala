package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-files compaction — the 100 TB housekeeping operator.
  *
  * A day of streaming micro-batches (or an over-parallel backfill)
  * leaves directories of KB-scale parquet files; every reader then pays
  * one scheduler task and one footer-open per file, and pushdown loses
  * its leverage because row-group stats cover a handful of rows. This
  * rewrites a directory into ~`targetBytes` files:
  *
  *  - file count = ceil(inputBytes / targetBytes), measured from the
  *    source file statuses (metadata only — nothing is read to size).
  *  - `repartitionByRange(sortKey)` + `sortWithinPartitions` keeps the
  *    output range-clustered on the sort key, so each file's min/max
  *    stats stay selective (partition pruning / row-group skipping keep
  *    working after compaction). One full shuffle of the data — that is
  *    the price of compaction and it parallelizes across the cluster.
  *  - `maxRecordsPerFile` caps pathological skew (a range partition that
  *    compresses far worse than average still splits).
  *
  * Returns (filesBefore, filesAfter, inputBytes) so callers can log the
  * compaction ratio ([[MigrationLog]] pattern).
  */
object Compaction {

  final case class CompactionReport(filesBefore: Int, filesAfter: Int,
                                    inputBytes: Long)

  def compact(spark: SparkSession, inDir: String, outDir: String,
              sortKey: String, targetBytes: Long,
              maxRecordsPerFile: Long = 0L): CompactionReport = {
    val df = spark.read.parquet(inDir)
    val hconf = spark.sessionState.newHadoopConf()
    val files = df.inputFiles
    val bytes = files.map { f =>
      val p = new Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val writer = df.repartitionByRange(n, col(sortKey))
      .sortWithinPartitions(sortKey)
      .write.mode(SaveMode.Overwrite)
    (if (maxRecordsPerFile > 0L)
       writer.option("maxRecordsPerFile", maxRecordsPerFile)
     else writer)
      .parquet(outDir)
    val out = new Path(outDir)
    val fs = out.getFileSystem(hconf)
    val after = fs.listStatus(out)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactionReport(files.length, after, bytes)
  }
}
