package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative long columns: bit i of `a` lands at position 2i+1, bit
    * i of `b` at 2i. Pure built-in bit ops — codegen'd, no UDF.
    */
  private[graft] def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` Z-order-clustered on TWO numeric columns — the
    * multi-dimensional analogue of [[writeSorted]] (one sort column gives
    * tight min/max stats on that column only; interleaving gives
    * USEFUL-though-looser stats on both). Each output file covers one
    * contiguous Z range = an axis-aligned tile of the (c1, c2) plane, so
    * a selective predicate on EITHER column intersects only the files
    * whose tile overlaps it — row-group min/max skips the rest. One
    * min/max stats pass scales both columns to `bits`-bit grid
    * coordinates (rank-scaling would beat min/max under heavy skew; at
    * 100 TB swap in approx quantiles without touching the interleave).
    */
  def writeZOrdered(df: DataFrame, c1: String, c2: String, path: String,
                    numFiles: Int = 16, bits: Int = 12): Unit = {
    val r = df.agg(
      min(col(c1).cast("long")), max(col(c1).cast("long")),
      min(col(c2).cast("long")), max(col(c2).cast("long"))).head()
    // empty/all-null input: min/max are NULL and getLong would NPE the
    // artifact phase — there is nothing to cluster, write the (empty)
    // relation as-is and return
    if (r.isNullAt(0) || r.isNullAt(2)) {
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val (lo1, hi1, lo2, hi2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val gmax = (1L << bits) - 1
    // The VALUE is cast to Decimal(38,0) before anything else touches
    // it: (c - lo) in long arithmetic wraps whenever the column range
    // itself exceeds Long.MaxValue (min near Long.MinValue, positive
    // max — the full-range surrogate-key case), and (c - lo) * gmax
    // wraps once the range exceeds Long.MaxValue / gmax (~2.25e15 at
    // 12 bits — e.g. nanosecond timestamps spanning more than ~26
    // days); either way the z-values garble and the clustering this
    // function exists to provide is destroyed. The divisor is built in
    // BigDecimal on the driver for the same reason (hi - lo overflows
    // driver Long math first). Decimal all the way keeps the grid
    // coordinate exact for any long range (Column./ on longs would
    // detour through double).
    def scale(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else floor((c.cast("long")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))
        - lit(BigDecimal(lo)))
        * lit(gmax) / lit(BigDecimal(hi) - BigDecimal(lo)))
        .cast("long")
    val z = zValue(scale(col(c1), lo1, hi1), scale(col(c2), lo2, hi2), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z") // projection after the sort keeps the row order
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Shard-major training-order materialization: write a permutation
    * relation (must carry `shard` int + `pos` long — the
    * [[graft.ops.SampleQueries.shuffleShardPerm]] columns) as one
    * directory per shard whose files, read in LEXICOGRAPHIC name order,
    * replay the shard's rows in exact permutation order — so a training
    * loader that walks shard dirs 0..15 and streams each dir's files in
    * listing order reads the exact global permutation without any sort
    * (ShardReplaySpec proves read-back == the oracle ROW_NUMBER order).
    *
    * Why the layout guarantees it: `repartitionByRange` on (shard, pos)
    * produces partitions that are ORDERED, CONTIGUOUS ranges of the
    * permutation, and Spark names output files part-NNNNN by partition
    * id — so within any shard directory, file-name order == range order
    * — while `sortWithinPartitions` orders rows inside each file. A
    * range boundary landing mid-shard (the sampler is approximate)
    * splits a dir into several files but cannot reorder them.
    *
    * `numFiles` is the TOTAL file budget across shards. At 100 TB pick
    * it so each file is a loader-friendly 256 MB–1 GB (corpus bytes /
    * target file size, rounded to a multiple of 16 so shard boundaries
    * don't straddle more files than they must) — see SCALE.md; 16 (one
    * file per shard) is right at test scale only.
    */
  def writeShardMajor(perm: DataFrame, path: String,
                      numFiles: Int = 16, posCol: String = "pos"): Unit =
    perm.repartitionByRange(numFiles, col("shard"), col(posCol))
      .sortWithinPartitions("shard", posCol)
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(path)

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
