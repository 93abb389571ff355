package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Streaming face of the embedding-drift monitor (SURVEY.md §2 H2'j,
  * `q_embedding_drift`): maintain per-(label, dimension) running
  * moments over an unbounded vector stream so slice drift can be
  * watched on LIVE ingest instead of a periodic batch re-scan — the
  * monitoring deployment the batch query models.
  *
  * Shape: state is one (count, decimal sum) pair per (label, dim) key
  * — label-vocabulary x dimension rows (thousands), NOT stream-scale;
  * a hot label costs additions, never memory. Exactness: each arriving
  * element is cast through the SAME Spark `DECIMAL(30,15)` cast the
  * batch query applies, and the running sum is exact decimal addition
  * — order-independent, so the streamed moments equal the batch
  * aggregate bit-for-bit on the same rows (differential-tested).
  * The pairwise-matrix reduction over the moment snapshot is the one
  * shared definition ([[graft.ops.SimilarityQueries.driftMatrix]]).
  *
  * At scale the keyed state lives in the state store partitioned by
  * (label, dim) hash — same partitioning as the batch groupBy, with
  * map-side pre-aggregation happening naturally per trigger (each
  * trigger folds its whole group iterator into one state update).
  */
object DriftStream {

  /** One (label, dim)'s running moment so far: count is monotone per
    * key; (cnt, sum) update atomically each trigger.
    */
  final case class DimMoment(label: Int, i: Int, cnt: Long,
                             sum: scala.math.BigDecimal)

  /** Keyed running moments via flatMapGroupsWithState. Input: one row
    * per vector with columns `label` (int) and `v` (array<double>).
    * Each trigger emits the (label, dim) keys updated in that batch
    * with their new running (count, exact decimal sum).
    */
  def labelMoments(rows: DataFrame)(implicit spark: SparkSession): Dataset[DimMoment] = {
    import spark.implicits._
    rows.select(col("label").cast("int").as("label"),
        posexplode(col("v")).as(Seq("i", "x")))
      // the batch query's exact-sum convention, applied per element at
      // ingest: DECIMAL(30,15) via the same Spark cast
      .select(col("label"), col("i"),
        col("x").cast(DecimalType(30, 15)).as("x"))
      .as[(Int, Int, scala.math.BigDecimal)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[(Long, scala.math.BigDecimal), DimMoment](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case ((label, i), rows, state: GroupState[(Long, scala.math.BigDecimal)]) =>
          var (c, s) = state.getOption.getOrElse((0L, scala.math.BigDecimal(0)))
          rows.foreach { t => c += 1; s = s + t._3 }
          state.update((c, s))
          Iterator.single(DimMoment(label, i, c, s))
      }
  }

  /** The batch reduction over a moment snapshot: latest row per
    * (label, dim) — cnt is monotone per key and (cnt, sum) write
    * atomically, so `max(struct(cnt, sum))` selects it exactly from an
    * Update-mode sink — then per-dim mean, centroid assembly, and the
    * SHARED pairwise matrix ([[graft.ops.SimilarityQueries.driftMatrix]]).
    */
  def summarize(moments: DataFrame): DataFrame = {
    val latest = moments.groupBy("label", "i")
      .agg(max(struct(col("cnt"), col("sum"))).as("m"))
      .select(col("label"), col("i"),
        col("m.cnt").as("cnt"), col("m.sum").as("sum"))
    val cm = latest.select(col("label"), col("i"),
      (col("sum").cast("double") / col("cnt")).as("m"), col("cnt"))
    val cn = cm.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("m")))),
        x => x.getField("m")).as("cv"),
        max(col("cnt")).as("n"))
    graft.ops.SimilarityQueries.driftMatrix(cn)
  }
}
