package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data curation step
  * that follows dedup/quality filtering in an LLM pipeline: downsample
  * over-represented strata (language, source) to a target mix.
  *
  * Selector = first 2 hex chars of md5(doc_id): a uniform 256-level hash
  * that both engines compute identically, so the sample is reproducible
  * ANYWHERE (unlike rand()/TABLESAMPLE, whose streams are engine- and
  * partitioning-dependent). Scale: stateless per-row predicate — no
  * shuffle, no driver coordination; at 100 TB the per-stratum rate map
  * rides along as a broadcast literal (here a CASE expression).
  */
object SampleQueries {

  // per-language keep-rates as hex thresholds out of 256: en is
  // over-represented in the corpus -> 25%; everything else 50%.
  private val rates = Seq("en" -> "40") // 0x40/0x100 = 25%
  private val defaultRate = "80"        // 0x80/0x100 = 50%

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_stratified_sample",
      "Deterministic stratified sample: keep a doc iff the first hex " +
        "byte of md5(doc_id) clears the per-language threshold (en 25%, " +
        "others 50%). Reproducible across engines and cluster layouts.",
      (s, dir) => {
        val thresh = rates.foldLeft(when(lit(false), lit(""))) {
          case (acc, (lang, hex)) => acc.when(col("lang") === lang, lit(hex))
        }.otherwise(lit(defaultRate))
        Tables.t(s, dir, "documents")
          .withColumn("sel", substring(md5(col("doc_id").cast("string")), 1, 2))
          .filter(col("sel") < thresh)
          .select(col("doc_id"), col("lang"), col("source"), col("sel"))
          .orderBy("doc_id")
      },
      Some {
        val cases = rates.map { case (l, h) => s"WHEN lang = '$l' THEN '$h'" }
          .mkString(" ")
        s"""SELECT doc_id, lang, source,
           |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS sel
           |FROM documents
           |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
           |  (CASE $cases ELSE '$defaultRate' END)
           |ORDER BY doc_id""".stripMargin
      }
    )
  )
}
