package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Stored IVF vector index — the third stored-artifact family (after
  * [[BandIndex]] and [[SpanSet]]): the cell assignment and refined
  * centroids the ANN queries score against, materialized as tables
  * instead of rebuilt (or merely session-cached) per run.
  *
  * Two tables per (corpus snapshot, cell count):
  *
  *   - `<tag>_ivfcells`     (vec_id, v, nrm, cell) bucketed by cell
  *   - `<tag>_ivfcentroids` (cell, cv, cn)         tiny, plain
  *
  * Bucketing on `cell` makes the inverted-list side scan-only for a
  * shuffled probe join, and keeps each cell's vectors co-located for
  * within-cell passes (the semantic-dedup self-join); the centroid
  * table is ~√n rows and broadcasts at any corpus scale. The build is
  * the SAME deterministic seed/Lloyd/assign pipeline as the
  * session-cached path ([[SimilarityQueries.buildIvf]] — one
  * definition, no drift), so stored and cached results are identical
  * and the DuckDB oracle stays bit-comparable.
  *
  * Maintenance mirrors the other artifacts: [[append]] assigns a new
  * batch against the EXISTING centroids and inserts its cell rows
  * (centroids go stale as data drifts — the documented lower-bound
  * analogue), [[refreshCentroids]] recomputes exact Lloyd means from
  * the stored cells. Builds run once per (session, snapshot, cells)
  * keyed by catalog presence.
  */
object IvfIndex {

  /** Tag embeds the cell count: a derived-cells change must build a new
    * artifact, not silently read one quantized differently.
    */
  def tag(dir: String, nCells: Int): String =
    BandIndex.tag(dir, s"ivf$nCells")

  private def cellsT(tag: String) = s"${tag}_ivfcells"
  private def centT(tag: String) = s"${tag}_ivfcentroids"

  /** Derived bucket count this tag was built with (report-row metric). */
  def buckets(spark: SparkSession, tag: String): Int =
    BandIndex.bucketsOf(spark, cellsT(tag))

  /** Materialize (or reuse, if already cataloged this session) the IVF
    * index for the corpus at `dir`. Returns (cells, centroids) as reads
    * of the stored tables.
    */
  def buildOrLoad(spark: SparkSession, dir: String, nCells: Int,
                  log: graft.etl.MigrationLog = graft.etl.MigrationLog.silent,
                  targetRowsPerBucket: Long = BandIndex.TargetRowsPerBucket
                 ): (DataFrame, DataFrame) = {
    val t = tag(dir, nCells)
    val (cT, mT) = (cellsT(t), centT(t))
    // Gate on BOTH tables: cT is written first, so a crash before mT
    // lands would otherwise leave a half-built index that short-circuits
    // every later call into a missing-table error (the ContainIndex
    // self-heal fix, applied to the one other family that writes its
    // gate table first).
    if (!(spark.catalog.tableExists(cT) && spark.catalog.tableExists(mT))) {
      BandIndex.dropStaleLocations(spark, Seq(cT, mT))
      // Cell-row cardinality == corpus cardinality (one row per vector),
      // so the bucket derivation reads the parquet count — metadata-only,
      // no extra corpus pass.
      val buckets = BandIndex.derivedBuckets(
        graft.Tables.t(spark, dir, "embeddings").count(), targetRowsPerBucket)
      val (a2, centn) = SimilarityQueries.buildIvf(
        SimilarityQueries.normalizedCorpus(spark, dir), nCells)
      a2.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, "cell").sortBy("cell")
        .saveAsTable(cT)
      centn.write.mode(SaveMode.Overwrite).saveAsTable(mT)
      // Build-time audit: list balance decides probe cost — a corpus
      // collapsing into few cells quantizes badly and deserves a loud
      // line (the hot-bucket convention applied to inverted lists).
      val (nVec, nUsed, maxCell) = cellStats(spark, t)
      val msg = s"cells=$nCells used=$nUsed vectors=$nVec max_cell=$maxCell"
      if (nUsed * 2 < nCells || (nVec > 0 && maxCell * 10 > nVec * 3))
        log.warn(cT, "ivf_index_build", msg)
      else log.info(cT, "ivf_index_build", msg)
    }
    (spark.table(cT), spark.table(mT))
  }

  /** (total vectors, occupied cells, largest cell) on the stored index
    * — scan-only balance audit for logs and pipeline report rows.
    */
  def cellStats(spark: SparkSession, tag: String): (Long, Long, Long) = {
    val r = spark.table(cellsT(tag))
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("nv"),
        count(lit(1)).as("nc"),
        coalesce(max(col("n")), lit(0L)).as("mx"))
      .collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Daily-ingest maintenance: assign `newVectors` (vec_id, v, nrm)
    * against the EXISTING stored centroids and append their cell rows
    * (insertInto preserves the bucket spec). Centroids are not moved —
    * they drift stale as appended data shifts the distribution, the
    * same documented staleness bound as the other artifacts' appends —
    * until [[refreshCentroids]].
    */
  def append(spark: SparkSession, newVectors: DataFrame, tag: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val (cT, mT) = (cellsT(tag), centT(tag))
    require(spark.catalog.tableExists(cT) && spark.catalog.tableExists(mT),
      s"append target $tag does not exist — buildOrLoad first")
    val centn = spark.table(mT)
    val w = Window.partitionBy("vec_id").orderBy(col("cosc").desc, col("cell").asc)
    newVectors.crossJoin(broadcast(centn))
      .withColumn("cosc",
        graft.functions.VectorFunctions.dot(col("v"), col("cv"))
          / (col("nrm") * col("cn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "v", "nrm", "cell")
      .write.insertInto(cT)
  }

  /** Periodic compaction: recompute exact Lloyd means (and norms) from
    * the stored cell assignment — the centroid refresh an IVF system
    * schedules after enough appends.
    */
  def refreshCentroids(spark: SparkSession, tag: String): Unit = {
    import org.apache.spark.sql.types.DecimalType
    val cm = spark.table(cellsT(tag))
      .select(col("cell"), posexplode(col("v")).as(Seq("pos0", "val")))
      .groupBy(col("cell"), (col("pos0") + lit(1)).as("pos"))
      .agg((sum(col("val").cast(DecimalType(30, 15))).cast("double") /
        count(lit(1))).as("m"))
    cm.groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("cv"))
      .withColumn("cn",
        sqrt(graft.functions.VectorFunctions.dot(col("cv"), col("cv"))))
      .write.mode(SaveMode.Overwrite).saveAsTable(centT(tag))
  }
}
