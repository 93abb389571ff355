package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2 H2):
  * brute-force cosine top-k as the exactness baseline, a signed-
  * random-projection (hyperplane LSH) bucketed variant as the scale path —
  * the bucket turns the O(n*q) cross join into an equi-join, which at
  * 100 TB shuffles once on the bucket key instead of replicating the
  * corpus per query — and a recall@k query that joins the two so the
  * approximation error is a measured number, not a belief.
  */
object SimilarityQueries {

  private val K = 5
  private val NumPlanes = 8
  private val Dim = 64
  private val planes = makePlanes(NumPlanes, Dim)

  /** every 25th vector is a "query" — scale-independent choice. */
  private val QueryPred = "vec_id % 25 = 0"

  private def planeSqlLits: Seq[String] =
    planes.map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]"))

  private val bucketSql: String =
    planeSqlLits.map(p =>
      s"CASE WHEN list_dot_product(v, $p::DOUBLE[]) >= 0.0 THEN '1' ELSE '0' END")
      .mkString("||")

  // ---------------------------------------------------------------- Spark
  // Shared builders: the recall query composes the two pipelines, so they
  // must be the *same code*, not near-copies that can drift.

  /** corpus with double vector, norm, and LSH bucket. */
  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))

  private def rankW = org.apache.spark.sql.expressions.Window
    .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)

  /** Exact top-k: tiny query side broadcast against the full corpus. */
  private def exactTopK(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val q = e.filter(expr(QueryPred))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    broadcast(q).crossJoin(e.drop("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= K)
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket. */
  private def annTopK(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val q = e.filter(expr(QueryPred))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
    q.join(e, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= K)
  }

  /** Multi-probe masks: flip 0, 1, or 2 of the NumPlanes sign bits —
    * 1 + 8 + 28 = 37 of 256 buckets probed (~14% of a uniform corpus).
    * Probing the QUERY side keeps the corpus untouched: no re-index, no
    * extra corpus shuffle — the fan-out is 37x on the tiny query relation.
    */
  private val probeMasks: Seq[Seq[Int]] =
    Seq(Seq.empty[Int]) ++
      (0 until NumPlanes).map(Seq(_)) ++
      (for { i <- 0 until NumPlanes; j <- (i + 1) until NumPlanes } yield Seq(i, j))

  private def flipBits(bucket: org.apache.spark.sql.Column, flips: Seq[Int]) =
    concat((0 until NumPlanes).map { i =>
      val c = substring(bucket, i + 1, 1)
      if (flips.contains(i)) when(c === "1", lit("0")).otherwise(lit("1")) else c
    }: _*)

  /** Multi-probe ANN top-k: each query also searches every bucket within
    * Hamming distance 2 of its own. For a neighbor at per-plane agreement
    * p, recall rises from p^8 to p^8 + 8p^7(1-p) + 28p^6(1-p)^2 — e.g.
    * 0.29 -> 0.91 at cosine 0.9 — at 37/256 of brute-force cost.
    */
  private def annMultiProbeTopK(s: SparkSession, dir: String): DataFrame = {
    val e = corpus(s, dir)
    val q = e.filter(expr(QueryPred))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket"))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(array(probeMasks.map(m => flipBits(col("bucket"), m)): _*))
          .as("bucket"))
    // the 37 probe buckets of one query are distinct strings, so a corpus
    // vector can match at most one probe — no candidate dedup needed.
    q.join(e, "bucket")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= K)
  }

  // ---------------------------------------------------------------- SQL
  // Shared CTE bodies for the DuckDB twins, composed the same way.

  private val baseCte =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm,
       |  $bucketSql AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket
       |  FROM n WHERE $QueryPred)""".stripMargin

  private val exactScoredCte =
    s"""exact_scored AS (
       |  SELECT query_id, vec_id,
       |    list_dot_product(qv, v)/(qn*nrm) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY list_dot_product(qv, v)/(qn*nrm) DESC, vec_id ASC) AS rank
       |  FROM q, n WHERE query_id <> vec_id)""".stripMargin

  private val annScoredCte =
    s"""ann_scored AS (
       |  SELECT query_id, vec_id, bucket,
       |    list_dot_product(qv, v)/(qn*nrm) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY list_dot_product(qv, v)/(qn*nrm) DESC, vec_id ASC) AS rank
       |  FROM q JOIN n USING (bucket) WHERE query_id <> vec_id)""".stripMargin

  private def flipBitsSql(flips: Seq[Int]): String =
    (0 until NumPlanes).map { i =>
      val c = s"substr(bucket,${i + 1},1)"
      if (flips.contains(i)) s"CASE WHEN $c='1' THEN '0' ELSE '1' END" else c
    }.mkString("||")

  private val probesCte =
    "probes AS (" + probeMasks.map(m =>
      s"SELECT query_id, qv, qn, ${flipBitsSql(m)} AS bucket FROM q")
      .mkString("\nUNION ALL ") + ")"

  private val mpScoredCte =
    s"""mp_scored AS (
       |  SELECT query_id, vec_id, bucket,
       |    list_dot_product(qv, v)/(qn*nrm) AS cos,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY list_dot_product(qv, v)/(qn*nrm) DESC, vec_id ASC) AS rank
       |  FROM probes JOIN n USING (bucket) WHERE query_id <> vec_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_embedding_topk",
      "Brute-force cosine top-k (exact ANN baseline): query rows cross-" +
        "join the corpus — the query side is tiny, so Spark broadcasts it " +
        "— then per-query row_number keeps k.",
      (s, dir) => exactTopK(s, dir)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cosine"))
        .orderBy("query_id", "rank"),
      Some(s"""WITH $baseCte,
              |$exactScoredCte
              |SELECT query_id, rank, vec_id AS neighbor_id, round(cos,6) AS cosine
              |FROM exact_scored WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    ),

    QueryDef(
      "q_ann_hyperplane",
      s"Approximate NN via $NumPlanes signed random projections: vectors " +
        "land in 2^8 sign buckets; candidates = same-bucket equi-join; " +
        "exact cosine re-rank within bucket. Recall < 1 by design — " +
        "measured by q_ann_recall; the oracle twin embeds the identical " +
        "plane literals so results match.",
      (s, dir) => annTopK(s, dir)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cosine"), col("bucket"))
        .orderBy("query_id", "rank"),
      Some(s"""WITH $baseCte,
              |$annScoredCte
              |SELECT query_id, rank, vec_id AS neighbor_id, round(cos,6) AS cosine, bucket
              |FROM ann_scored WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    ),

    QueryDef(
      "q_ann_multiprobe",
      s"Multi-probe ANN: each query searches all ${probeMasks.size} buckets " +
        "within Hamming distance 2 of its own sign bucket (query-side " +
        "fan-out only — the corpus index is untouched). Trades 37/256 of " +
        "brute-force candidate cost for a ~3x recall lift on this data.",
      (s, dir) => annMultiProbeTopK(s, dir)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("cos"), 6).as("cosine"), col("bucket"))
        .orderBy("query_id", "rank"),
      Some(s"""WITH $baseCte,
              |$probesCte,
              |$mpScoredCte
              |SELECT query_id, rank, vec_id AS neighbor_id, round(cos,6) AS cosine, bucket
              |FROM mp_scored WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    ),

    QueryDef(
      "q_ann_recall",
      s"Recall@$K of both ANN variants against the exact top-k, one " +
        "measured row per variant — an ANN operator without a recall " +
        "number is unfalsifiable. Left-join exact neighbors to ANN " +
        "neighbors; recall = matched / expected.",
      (s, dir) => {
        val exact = exactTopK(s, dir).select(col("query_id"), col("vec_id"))
        def recallRow(ann: DataFrame, variant: String): DataFrame =
          exact.join(ann.select(col("query_id"), col("vec_id"))
              .withColumn("hit", lit(1)),
            Seq("query_id", "vec_id"), "left")
            .agg(countDistinct(col("query_id")).as("n_queries"),
              count(lit(1)).as("n_exact"),
              sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
            .select(lit(variant).as("variant"), col("n_queries"),
              col("n_exact"), col("n_hit"),
              round(col("n_hit") / col("n_exact"), 4).as(s"recall_at_$K"))
        recallRow(annTopK(s, dir), "single_probe")
          .union(recallRow(annMultiProbeTopK(s, dir), "multiprobe_h2"))
          .orderBy("variant")
      },
      Some {
        def recallSelect(annCte: String, variant: String) =
          s"""SELECT '$variant' AS variant,
             |  count(DISTINCT ex.query_id) AS n_queries,
             |  count(*) AS n_exact,
             |  CAST(sum(CASE WHEN an.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
             |  round(CAST(sum(CASE WHEN an.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             |    / count(*), 4) AS recall_at_$K
             |FROM ex LEFT JOIN
             |  (SELECT query_id, vec_id FROM $annCte WHERE rank <= $K) an
             |  ON ex.query_id = an.query_id AND ex.vec_id = an.vec_id""".stripMargin
        s"""WITH $baseCte,
           |$probesCte,
           |$exactScoredCte,
           |$annScoredCte,
           |$mpScoredCte,
           |ex AS (SELECT query_id, vec_id FROM exact_scored WHERE rank <= $K)
           |SELECT * FROM (
           |${recallSelect("ann_scored", "single_probe")}
           |UNION ALL
           |${recallSelect("mp_scored", "multiprobe_h2")}
           |) ORDER BY variant""".stripMargin
      }
    )
  )
}
