package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph analytics over the document-similarity graph (SURVEY.md §2
  * H-extension): PageRank centrality on the verified MinHash near-dup
  * pairs. The reference (seanharr11/etlalchemy) has no graph operators;
  * this is part of the training-data-pipeline extension surface — link-
  * style centrality is the classic corpus quality-weighting signal
  * (crawl-graph PageRank is a standard quality feature in web-corpus
  * curation, cf. CommonCrawl-derived datasets), and the similarity graph
  * is the one this engine already materializes for dedup.
  *
  * Determinism across engines: every per-edge contribution r(u)/outdeg(u)
  * is rounded 9dp then DECIMAL(38,9)-summed (order-independent — the
  * q_lm_perplexity convention), each iterate is re-rounded 9dp, and the
  * teleport/dangling terms are fixed sequences of exactly-rounded IEEE
  * ops on identical inputs, so the oracle's unrolled CTE replay is
  * bit-comparable round by round.
  */
object GraphQueries {

  /** Power-iteration rounds — fixed and unrolled in the oracle. */
  private[ops] val PrRounds = 3

  /** Damping factor (Brin & Page 1998's 0.85). */
  private val Damping = 0.85

  private def dsum9(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(38, 9))).cast("double")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pagerank",
      s"PageRank centrality ($PrRounds unrolled power-iteration rounds, " +
        s"d=$Damping) over the verified MinHash near-dup graph " +
        "(symmetrized), teleport + dangling mass handled exactly: " +
        "r' = 0.15/n + 0.85*(in-sum + dangling/n). The corpus quality-" +
        "weighting signal: a doc central in the duplication graph is " +
        "boilerplate-like; isolated docs stay at teleport mass. Scale " +
        "shape per round: one equi-join of the edge relation against " +
        "the current rank vector + one dst-keyed agg — the edge " +
        "relation is vocab-scale (verified near-dup pairs, orders of " +
        "magnitude below corpus row count) and reuses the session-" +
        "cached minhash candidate family; rounds are driver-sequenced " +
        "with localCheckpoint linear lineage (the star-contraction " +
        "pattern). Per-edge contributions rounded 9dp + DECIMAL-summed, " +
        "iterates re-rounded 9dp, so both engines converge identically.",
      (s, dir) => {
        val pairs = DedupQueries.minhashPairs(s, dir)
          .select(col("doc_a"), col("doc_b"))
        // r18 (§3.3): sym is read once per power round and outdeg twice
        // per round plus the final join (7-8 references) — eager-
        // checkpoint both once (edge-scale relations; the same
        // linear-lineage discipline the rank iterate already uses).
        // Freed with the minhash family alongside the final iterate.
        val sym = GraftSqlBridge.freshLocalCheckpoint(pairs
          .unionAll(pairs.select(col("doc_b").as("doc_a"),
            col("doc_a").as("doc_b")))
          .select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val outdeg = GraftSqlBridge.freshLocalCheckpoint(
          sym.groupBy("src").agg(count(lit(1)).as("outdeg")))
        SharedCaches.onRelease(SharedCaches.Minhash) { () =>
          Checkpoints.free(sym); Checkpoints.free(outdeg)
        }
        val docs = Tables.t(s, dir, "documents").select("doc_id")
        // 1-row scalar fetch (artifact-derivation convention): n seeds
        // the teleport term of every round's plan.
        val n = docs.count()
        var r = docs.withColumn("pr", lit(1.0) / lit(n.toDouble))
        for (_ <- 1 to PrRounds) {
          val prev = r
          val contrib = sym
            .join(r, sym("src") === r("doc_id"))
            .join(outdeg, "src")
            .select(col("dst").as("doc_id"),
              round(col("pr") / col("outdeg"), 9).as("c"))
            .groupBy("doc_id").agg(dsum9(col("c")).as("in_sum"))
          val dang = r
            .join(outdeg, r("doc_id") === outdeg("src"), "left_anti")
            .agg(coalesce(dsum9(round(col("pr"), 9)), lit(0.0)).as("dmass"))
          r = docs
            .join(contrib, Seq("doc_id"), "left")
            .crossJoin(broadcast(dang))
            .select(col("doc_id"),
              round(lit(1.0 - Damping) / lit(n.toDouble) + lit(Damping) *
                (coalesce(col("in_sum"), lit(0.0))
                  + col("dmass") / lit(n.toDouble)), 9).as("pr"))
          r = GraftSqlBridge.freshLocalCheckpoint(r)
          // eager checkpoint above: prev's blocks are dead the moment
          // the new iterate is materialized (round 0 has none — no-op)
          Checkpoints.free(prev)
        }
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("pr").desc, col("doc_id").asc)
        val out = r
          .join(outdeg.select(col("src").as("doc_id"), col("outdeg")),
            Seq("doc_id"), "left")
          .withColumn("outdeg", coalesce(col("outdeg"), lit(0L)))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 20)
          .select(col("rank"), col("doc_id"), col("outdeg"),
            round(col("pr"), 6).as("pr"))
          .orderBy("rank")
        // The final iterate's checkpoint backs the returned (lazy) plan,
        // so it must survive until the consumer runs — free it with the
        // minhash family (q_pagerank is that family's last declared
        // consumer, so the bench releases right after this query).
        SharedCaches.onRelease(SharedCaches.Minhash)(() => Checkpoints.free(out))
        out
      },
      Some {
        val teleport = s"${1.0 - Damping} / n.n"
        def roundCtes(k: Int): String = {
          val prev = s"r$k"
          s"""in$k AS (SELECT e.dst AS doc_id,
             |    CAST(SUM(CAST(round(r.pr / o.outdeg, 9) AS DECIMAL(38,9)))
             |      AS DOUBLE) AS in_sum
             |  FROM e JOIN $prev r ON e.src = r.doc_id
             |    JOIN outdeg o ON o.src = e.src GROUP BY 1),
             |dang$k AS (SELECT COALESCE(CAST(SUM(CAST(round(r.pr, 9)
             |      AS DECIMAL(38,9))) AS DOUBLE), 0.0) AS dmass
             |  FROM $prev r LEFT JOIN outdeg o ON r.doc_id = o.src
             |  WHERE o.src IS NULL),
             |r${k + 1} AS (SELECT d.doc_id,
             |    round($teleport + $Damping * (COALESCE(i.in_sum, 0.0)
             |      + g.dmass / n.n), 9) AS pr
             |  FROM docs d LEFT JOIN in$k i ON d.doc_id = i.doc_id,
             |    dang$k g, n)"""
        }
        val rounds = (0 until PrRounds).map(roundCtes).mkString(",\n")
        s"""WITH ${DedupQueries.pairsSqlCtes},
           |e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |  UNION ALL SELECT doc_b, doc_a FROM pairs),
           |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
           |docs AS (SELECT doc_id FROM documents),
           |n AS (SELECT COUNT(*) AS n FROM docs),
           |r0 AS (SELECT doc_id, 1.0 / n.n AS pr FROM docs, n),
           |$rounds,
           |fin AS (SELECT r.doc_id, COALESCE(o.outdeg, 0) AS outdeg, r.pr,
           |    ROW_NUMBER() OVER (ORDER BY r.pr DESC, r.doc_id ASC) AS rank
           |  FROM r$PrRounds r LEFT JOIN outdeg o ON r.doc_id = o.src)
           |SELECT rank, doc_id, outdeg, round(pr, 6) AS pr
           |FROM fin WHERE rank <= 20 ORDER BY rank""".stripMargin
      }
    ),

    QueryDef(
      "q_dup_triangles",
      "Triangle census + global clustering coefficient of the verified " +
        "near-dup graph — the structure metric that tells a dedup " +
        "review WHAT KIND of duplication it is looking at: a " +
        "coefficient near 1 means cliques (template families — " +
        "mirrored/boilerplate content where every copy pairs with " +
        "every other), near 0 means chains (drifted partial overlaps " +
        "that only adjacent revisions pair) — and the two regimes " +
        "want different policies (cluster caps vs keeper election). " +
        "One row: edges, docs-with-an-edge, wedges (Σ deg·(deg−1)/2), " +
        "triangles (counted once each via the doc_a<doc_b edge " +
        "orientation: e1=(a,b) ⋈ e2=(b,c) ⋈ closing e3=(a,c)), and " +
        "coefficient = 3·triangles/wedges (NULL when wedge-free). " +
        "Scale: the edge relation is the cached verified-pair family — " +
        "orders of magnitude below corpus rows — and the two-hop join " +
        "is edge-keyed on it; all integer arithmetic until the one " +
        "rounded division.",
      (s, dir) => {
        val e = DedupQueries.minhashPairs(s, dir)
          .select(col("doc_a"), col("doc_b"))
        val deg = e.select(col("doc_a").as("v"))
          .unionAll(e.select(col("doc_b").as("v")))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val wedges = deg.agg(
          count(lit(1)).as("n_docs"),
          coalesce(sum(col("d") * (col("d") - 1) / 2), lit(0L))
            .cast("long").as("n_wedges"))
        val tri = e.select(col("doc_a").as("a"), col("doc_b").as("b"))
          .join(e.select(col("doc_a").as("b"), col("doc_b").as("c")), "b")
          .join(e.select(col("doc_a").as("a"), col("doc_b").as("c")),
            Seq("a", "c"))
          .agg(count(lit(1)).as("n_triangles"))
        e.agg(count(lit(1)).as("n_edges"))
          .crossJoin(wedges).crossJoin(tri)
          .select(col("n_edges"), col("n_docs"), col("n_wedges"),
            col("n_triangles"),
            when(col("n_wedges") > 0,
              round(lit(3L) * col("n_triangles") / col("n_wedges"), 6))
              .otherwise(lit(null).cast("double"))
              .as("clustering_coeff"))
      },
      Some {
        s"""WITH ${DedupQueries.pairsSqlCtes},
           |deg AS (SELECT v, COUNT(*) AS d FROM (
           |    SELECT doc_a AS v FROM pairs
           |    UNION ALL SELECT doc_b FROM pairs) GROUP BY v),
           |w AS (SELECT COUNT(*) AS n_docs,
           |    CAST(COALESCE(SUM(d * (d - 1) / 2), 0) AS BIGINT)
           |      AS n_wedges FROM deg),
           |tri AS (SELECT COUNT(*) AS n_triangles
           |  FROM pairs e1
           |  JOIN pairs e2 ON e1.doc_b = e2.doc_a
           |  JOIN pairs e3 ON e3.doc_a = e1.doc_a
           |    AND e3.doc_b = e2.doc_b),
           |m AS (SELECT (SELECT COUNT(*) FROM pairs) AS n_edges,
           |    n_docs, n_wedges, n_triangles FROM w, tri)
           |SELECT n_edges, n_docs, n_wedges, n_triangles,
           |  CASE WHEN n_wedges > 0
           |    THEN round(3 * CAST(n_triangles AS DOUBLE) / n_wedges, 6)
           |    ELSE NULL END AS clustering_coeff
           |FROM m""".stripMargin
      }
    )
  )
}
