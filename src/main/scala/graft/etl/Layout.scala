package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators — the Spark-native answer to the reference's
  * index migration (SURVEY.md §2 E1, `ETLAlchemySource.py::add_indexes`
  * ~L1150–1350). Spark has no secondary B-tree indexes; the equivalent
  * read-acceleration levers are LAYOUT:
  *
  *   - hash-partitioned directories  -> partition pruning (the analogue
  *     of an equality index: a filtered scan lists only matching dirs)
  *   - range-sort within files       -> parquet row-group min/max stats
  *     (the analogue of a range index: row groups outside the predicate
  *     range are skipped by the pushed filter)
  *   - bucketing (see BucketingSpec) -> shuffle-free repeated equi-joins
  *
  * At 100 TB these decide whether a selective query reads gigabytes or
  * the whole corpus; `LayoutSpec` PROVES the pruning (file-list counts
  * and row-group stats), it is not advisory metadata.
  */
object Layout {

  /** Write `df` hash-partitioned by `partCol` values (one directory per
    * value — use for low-cardinality columns like month, region key,
    * source). A reader filtering on `partCol` lists only the matching
    * directories: `PartitionFilters` in the scan, zero data files read
    * outside them.
    */
  def writePartitioned(df: DataFrame, partCol: String, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)

  /** Write `df` range-sorted on `sortCols`: repartitionByRange gives
    * disjoint per-file ranges, sortWithinPartitions orders rows inside
    * each file, so every parquet row group carries tight min/max stats
    * on `sortCols` and a pushed range predicate skips non-overlapping
    * row groups (and, with AQE + file pruning, whole files).
    */
  def writeSorted(df: DataFrame, sortCols: Seq[String], path: String,
                  numFiles: Int = 8): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Files a filtered scan of `path` actually touches — the pruning
    * evidence. Note `df.inputFiles` would NOT show pruning (it lists
    * the relation's whole file index); executing the scan and
    * collecting `input_file_name()` reports what was truly read.
    */
  def filesRead(spark: SparkSession, path: String,
                predicate: String): Array[String] =
    spark.read.parquet(path).filter(predicate)
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0))
}
