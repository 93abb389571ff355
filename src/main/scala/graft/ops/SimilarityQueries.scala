package graft.ops

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Similarity search over the embedding column (SURVEY.md §2 H2):
  * brute-force cosine top-k as the exactness baseline, and a signed-
  * random-projection (hyperplane LSH) bucketed variant as the scale path —
  * the bucket turns the O(n*q) cross join into an equi-join, which at
  * 100 TB shuffles once on the bucket key instead of replicating the
  * corpus per query.
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_embedding_topk",
      "Brute-force cosine top-k (exact ANN baseline): query rows cross-" +
        "join the corpus — the query side is tiny, so Spark broadcasts it " +
        "— then per-query row_number keeps k.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
          .withColumn("nrm", l2Norm(col("v")))
        val q = e.filter(expr(QueryPred))
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id").asc)
        broadcast(q).crossJoin(e)
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("cos"), 6).as("cosine"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm FROM e),
              |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE $QueryPred),
              |scored AS (
              |  SELECT query_id, vec_id,
              |    list_dot_product(qv, v)/(qn*nrm) AS cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY list_dot_product(qv, v)/(qn*nrm) DESC, vec_id ASC) AS rank
              |  FROM q, n WHERE query_id <> vec_id)
              |SELECT query_id, rank, vec_id AS neighbor_id, round(cos,6) AS cosine
              |FROM scored WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    ),

    QueryDef(
      "q_ann_hyperplane",
      s"Approximate NN via $NumPlanes signed random projections: vectors " +
        "land in 2^8 sign buckets; candidates = same-bucket equi-join; " +
        "exact cosine re-rank within bucket. Recall < 1 by design — the " +
        "oracle twin embeds the identical plane literals so results match.",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
          .withColumn("nrm", l2Norm(col("v")))
          .withColumn("bucket", hyperplaneBucket(col("v"), planes))
        val q = e.filter(expr(QueryPred))
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("bucket"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("vec_id").asc)
        q.join(e, "bucket")
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K)
          .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
            round(col("cos"), 6).as("cosine"), col("bucket"))
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
              |n AS (SELECT vec_id, v, sqrt(list_dot_product(v,v)) AS nrm,
              |  $bucketSql AS bucket FROM e),
              |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn, bucket
              |  FROM n WHERE $QueryPred),
              |scored AS (
              |  SELECT query_id, vec_id, bucket,
              |    list_dot_product(qv, v)/(qn*nrm) AS cos,
              |    ROW_NUMBER() OVER (PARTITION BY query_id
              |      ORDER BY list_dot_product(qv, v)/(qn*nrm) DESC, vec_id ASC) AS rank
              |  FROM q JOIN n USING (bucket) WHERE query_id <> vec_id)
              |SELECT query_id, rank, vec_id AS neighbor_id, round(cos,6) AS cosine, bucket
              |FROM scored WHERE rank <= $K ORDER BY query_id, rank""".stripMargin)
    )
  )
}
