package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the shuffle-key skew diagnostic (SURVEY.md §2 C7,
  * `q_skew_profile`): maintain per-key row counts over an unbounded
  * keyed stream so the skew decision (salt factor, AQE trust) can be
  * made on LIVE traffic instead of a periodic batch re-scan.
  *
  * Shape: keys group into keyed [[GroupState]] — ONE Long of state per
  * distinct key (the key-grain analogue of the heavy-hitter sketch's
  * bounded counters; a count profile is exact by definition, so its
  * state is exactly the distinct-key relation, which for a join-key
  * profile is orders of magnitude below stream row count). Each trigger
  * emits the updated keys' running counts (Update semantics); the
  * percentile/max/skew reduction over the count snapshot is the SAME
  * code as the batch query ([[graft.ops.JoinQueries.skewSummary]] — one
  * definition, no drift), run batch-side over the emitted state,
  * exactly as the SpaceSaving sketch's exact recount follow-up.
  *
  * At 100 TB-scale streams the per-key state lives in the state store
  * (RocksDB-backed on a real cluster) partitioned by key hash — the
  * same partitioning the batch groupBy count uses, with no skew
  * concern in the state layer itself because state is one row per KEY,
  * not per stream row; a hot key costs increments, not memory. If even
  * key-grain state is too wide (e.g. profiling a near-unique key to
  * prove it ISN'T skewed), cap with the SpaceSaving sketch face
  * ([[CorpusStream.heavyHitterSketch]]) — top-weight keys are the only
  * ones a skew mitigation acts on.
  */
object SkewStream {

  /** One key's running count so far (exact, monotone per key). */
  final case class KeyCount(k: Long, cnt: Long)

  /** Keyed running counts via flatMapGroupsWithState: state = one Long
    * per distinct key; each trigger emits the keys updated in that
    * batch with their new running totals. Input: one column `k`
    * (castable to long) per stream row.
    */
  def keyCounts(rows: DataFrame)(implicit spark: SparkSession): Dataset[KeyCount] = {
    import spark.implicits._
    rows.selectExpr("CAST(k AS LONG) AS k").as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, KeyCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, batchRows, state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + batchRows.size
          state.update(c)
          Iterator.single(KeyCount(key, c))
      }
  }

  /** The batch reduction over a count snapshot — delegate to the one
    * shared definition. `counts` must carry (k, cnt); for a streamed
    * Update-mode memory sink pass the LATEST row per key (counts are
    * monotone per key, so `groupBy(k).max(cnt)` selects it exactly).
    */
  def summarize(counts: DataFrame): DataFrame =
    graft.ops.JoinQueries.skewSummary(counts)
}
