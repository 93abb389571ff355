package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-data pipelines: documents are
  * concatenated in doc_id order within a shard and cut into fixed
  * token-budget sequences (the standard concat-and-chunk pretraining
  * layout). Each document's sequence assignment is a pure function of
  * the running token sum, so the whole operator is one window pass.
  *
  * Scale design: the window partitions by `source` (the shard key), so
  * at 100 TB every shard packs independently in parallel — there is no
  * global sort. A single-shard corpus would serialize; re-shard first
  * (e.g. `repartition(n, hash(doc_id))` with per-partition packing) —
  * the per-shard plan is identical.
  */
object PackingQueries {

  /** Fixed sequence token budget (a typical 2k-context packing target). */
  private val Budget = 2048

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private val toksSql = s"string_split($normSql,' ')"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_seq_packing",
      s"Concat-and-chunk sequence packing at a $Budget-token budget: per " +
        "source shard, running token sum over doc_id order; a doc's " +
        "sequence id is floor(start_offset / budget) and its offset " +
        "within that sequence falls out of the same cumulative sum.",
      (s, dir) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .select(col("source"), col("doc_id"), col("n_tokens"),
            floor((col("cum") - col("n_tokens")) / Budget).as("seq_id"),
            ((col("cum") - col("n_tokens")) % Budget).as("seq_offset"))
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |    CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
              |c AS (SELECT source, doc_id, n_tokens,
              |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cum FROM t)
              |SELECT source, doc_id, n_tokens,
              |  CAST(floor((cum - n_tokens) / $Budget) AS BIGINT) AS seq_id,
              |  CAST((cum - n_tokens) % $Budget AS BIGINT) AS seq_offset
              |FROM c ORDER BY source, doc_id""".stripMargin)
    )
  )
}
