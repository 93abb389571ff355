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

  /** Chunking window: `ChunkW`-token chunks every `ChunkStride` tokens
    * (overlap = W - stride). Small against the synthetic docs so the
    * multi-chunk path is exercised; at real doc lengths use e.g. 512/384.
    */
  private val ChunkW = 32
  private val ChunkStride = 24

  private val normSql =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private val toksSql = s"string_split($normSql,' ')"

  /** CTE chain ending in `chunks(doc_id, chunk_idx, start_tok,
    * n_chunk_tok, chunk_fp)` — the oracle twin of [[chunkRows]].
    */
  private val chunkSqlCtes: String = {
    val over = ChunkW - ChunkStride
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |nn AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |st AS (SELECT doc_id, toks, n, unnest(list_filter(
       |    range(0, n, $ChunkStride),
       |    st -> st = 0 OR st < n - $over)) AS start,
       |  generate_subscripts(list_filter(range(0, n, $ChunkStride),
       |    st -> st = 0 OR st < n - $over), 1) - 1 AS chunk_idx
       |  FROM nn),
       |chunks AS (SELECT doc_id, chunk_idx, start + 1 AS start_tok,
       |  least($ChunkW, n - start) AS n_chunk_tok,
       |  md5(array_to_string(toks[start+1:start+$ChunkW], ' ')) AS chunk_fp
       |FROM st)""".stripMargin
  }

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
    ),

    QueryDef(
      "q_packing_waste",
      "Packing-waste curve (r10 verdict #6 — the H9×H9c composition): " +
        "for each candidate window L, the single table a training run " +
        "reads to pick its sequence length — padding waste under the " +
        "naive one-doc-per-sequence pad-to-L layout (1 - Σmin(n,L)/NL), " +
        "padding waste under concat-and-chunk packing (1 - Σn/(L·seqs), " +
        "seqs = Σ_shard ceil(Σn/L) — per-shard independent packing, the " +
        "q_seq_packing layout), the packed sequence count, and the " +
        "truncation coverage q_context_fit prices data loss with (same " +
        "definition — PackingWasteSpec pins the two queries' columns " +
        "equal). Shape: ONE corpus pass fused per shard (groupBy source " +
        "computes every window's conditional sums map-side-partial), a " +
        "shard-grain fold (#sources rows), then unpivot — the " +
        "q_context_fit fusion argument with a per-shard ceil between " +
        "the two aggs. Integer sums, IEEE divisions rounded 6dp; " +
        "integer-exact ceil via (tok + L-1) div L in both engines.",
      (s, dir) => {
        val windows = Seq(16, 32, 64, 128)
        val n = size(tokens(col("text"))).cast("long")
        val sAggs = Seq(count(lit(1)).as("nd"), sum(n).as("tok")) ++
          windows.map(l => sum(least(n, lit(l.toLong))).as(s"cov_$l"))
        val perSrc = Tables.t(s, dir, "documents")
          .groupBy("source")
          .agg(sAggs.head, sAggs.tail: _*)
        val gAggs = Seq(sum(col("nd")).as("n_docs"),
          sum(col("tok")).as("tok_total")) ++
          windows.flatMap(l => Seq(
            sum(col(s"cov_$l")).as(s"cov_$l"),
            // integer-exact ceil: long `/` long in Spark detours through
            // double (floor(x/y) diverges from the oracle's HUGEINT //
            // once per-source token sums pass 2^53); `div` stays integral.
            sum(expr(s"(tok + ${l - 1}) div $l")).as(s"seq_$l")))
        val glob = perSrc.agg(gAggs.head, gAggs.tail: _*)
        // The pad denominators (n_docs*L, seqs*L) have only 2s and 5s as
        // factors, so the 6dp ratio routinely lands EXACTLY on a .5
        // rounding boundary where double round() diverges between
        // engines (hit at sf0.01: 0.2524375). Integer-exact HALF_UP
        // instead: round(num/den, 6) = (2e6*num + den) div (2*den),
        // computed in DECIMAL(38,0) so corpus-scale token counts cannot
        // overflow. trunc_coverage stays the plain double round — it is
        // BY DEFINITION q_context_fit's expression (spec-pinned equal).
        def fracExact(num: String, den: String) =
          expr(s"CAST((CAST($num AS DECIMAL(38,0)) * 2000000 + ($den)) DIV " +
            s"(CAST($den AS DECIMAL(38,0)) * 2) AS DOUBLE) / 1000000")
        val rows = windows.map(l => struct(lit(l).as("win"),
          col(s"seq_$l").as("n_seq_packed"),
          fracExact(s"n_docs * $l - cov_$l", s"n_docs * $l")
            .as("pad_frac_padded"),
          fracExact(s"seq_$l * $l - tok_total", s"seq_$l * $l")
            .as("pad_frac_packed"),
          round(col(s"cov_$l").cast("double") / col("tok_total"), 6)
            .as("trunc_coverage")))
        glob.select(explode(array(rows: _*)).as("r"))
          .select(col("r.*"))
          .orderBy("win")
      },
      Some {
        val windows = Seq(16, 32, 64, 128)
        val covs = windows.map(l =>
          s"sum(least(n, $l)) AS cov_$l").mkString(", ")
        val globs = windows.map(l =>
          s"CAST(sum(cov_$l) AS BIGINT) AS cov_$l, " +
            s"CAST(sum((tok + ${l - 1}) // $l) AS BIGINT) AS seq_$l")
          .mkString(", ")
        def fracExact(num: String, den: String) =
          s"CAST((CAST($num AS HUGEINT) * 2000000 + ($den)) // " +
            s"(CAST($den AS HUGEINT) * 2) AS DOUBLE) / 1000000"
        val sels = windows.map { l =>
          s"""SELECT $l AS win, seq_$l AS n_seq_packed,
             |  ${fracExact(s"n_docs*$l - cov_$l", s"n_docs*$l")}
             |    AS pad_frac_padded,
             |  ${fracExact(s"seq_$l*$l - tok_total", s"seq_$l*$l")}
             |    AS pad_frac_packed,
             |  round(CAST(cov_$l AS DOUBLE)/tok_total, 6) AS trunc_coverage
             |FROM g""".stripMargin
        }
        s"""WITH t AS (SELECT source, CAST(len($toksSql) AS BIGINT) AS n
           |  FROM documents),
           |s AS (SELECT source, count(*) AS nd, sum(n) AS tok, $covs
           |  FROM t GROUP BY source),
           |g AS (SELECT CAST(sum(nd) AS BIGINT) AS n_docs,
           |    CAST(sum(tok) AS BIGINT) AS tok_total, $globs FROM s)
           |SELECT * FROM (
           |${sels.mkString("\nUNION ALL\n")}
           |) ORDER BY win""".stripMargin
      }
    ),

    QueryDef(
      "q_doc_chunk",
      s"Document chunking for embedding/retrieval pipelines: sliding " +
        s"$ChunkW-token windows every $ChunkStride tokens " +
        s"(${ChunkW - ChunkStride}-token overlap) with FULL TAIL " +
        "coverage — a start is kept iff it is 0 or begins past the " +
        "previous chunk's coverage, so the last tokens of a doc are " +
        "never silently dropped (the off-by-one most chunkers get " +
        "wrong). Emits one row per chunk with its token span and a " +
        "chunk-text fingerprint (the id an embedding/RAG index stores). " +
        "Reads the STORED chunk table (ChunkStore: bucketed on " +
        "chunk_fp, built once per corpus snapshot by the stateless " +
        "map-only chunker) — scan + output sort, the corpus is not " +
        "re-chunked per query.",
      (s, dir) => chunkRows(s, dir).orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH $chunkSqlCtes
              |SELECT doc_id, chunk_idx, start_tok, n_chunk_tok, chunk_fp
              |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin)
    ),

    QueryDef(
      "q_chunk_dedup",
      "Chunk-store dedup — the maintenance pass a RAG/embedding store " +
        "runs over its chunk table: one row per chunk FINGERPRINT " +
        "embedded more than once (across docs via shared boilerplate, " +
        "or within one doc via internal repetition), with its " +
        "occurrence count and the keeper chunk (min (doc, idx)) — the " +
        "one whose embedding is kept while the rest are dropped " +
        "before paying the embedding model. Composes the chunker with " +
        "the exact-dedup skeleton over the STORED chunk table: the " +
        "group key IS the bucket key, so the whole aggregation runs " +
        "exchange-free off the chunk_fp-bucketed scan " +
        "(plan-shape-tested) — only the reduced dup-fingerprint output " +
        "moves for the final sort.",
      (s, dir) => {
        chunkRows(s, dir)
          .groupBy("chunk_fp")
          .agg(count(lit(1)).as("n_copies"),
            min(struct(col("doc_id"), col("chunk_idx"))).as("k"))
          .filter(col("n_copies") >= 2)
          .select(col("chunk_fp"), col("n_copies"),
            col("k.doc_id").as("keeper_doc"),
            col("k.chunk_idx").as("keeper_idx"))
          .orderBy("chunk_fp")
      },
      Some(s"""WITH $chunkSqlCtes,
              |d AS (SELECT chunk_fp, doc_id, chunk_idx,
              |    count(*) OVER (PARTITION BY chunk_fp) AS n_copies,
              |    ROW_NUMBER() OVER (PARTITION BY chunk_fp
              |      ORDER BY doc_id, chunk_idx) AS rn
              |  FROM chunks)
              |SELECT chunk_fp, n_copies, doc_id AS keeper_doc,
              |  chunk_idx AS keeper_idx
              |FROM d WHERE rn = 1 AND n_copies >= 2
              |ORDER BY chunk_fp""".stripMargin)
    )
  )

  /** One row per (doc, chunk) with token span + chunk-text fingerprint
    * for any relation carrying `doc_id` + `text` — the ONE chunker
    * shared by the chunking query, the stored [[ChunkStore]] build, and
    * the streaming ingest probe
    * ([[graft.streaming.CorpusStream.embeddedChunkHits]]), so batch and
    * ingest-time chunking cannot drift. Stateless per-row explode —
    * usable on a streaming input.
    */
  private[graft] def chunkRowsOf(docs: org.apache.spark.sql.DataFrame,
                                 passthrough: Seq[String] = Nil
                                ): org.apache.spark.sql.DataFrame = {
    val over = ChunkW - ChunkStride
    val keep = passthrough.map(col)
    docs
      .withColumn("toks", tokens(col("text")))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id") +: keep :+ col("toks") :+ col("n") :+
        posexplode(filter(
          sequence(lit(0), col("n") - 1, lit(ChunkStride)),
          st => st === 0 || st < col("n") - over))
          .as(Seq("chunk_idx", "start")): _*)
      .select(col("doc_id") +: keep :+ col("chunk_idx") :+
        (col("start") + 1).as("start_tok") :+
        least(lit(ChunkW), col("n") - col("start")).as("n_chunk_tok") :+
        md5(array_join(slice(col("toks"), col("start") + 1, lit(ChunkW)),
          " ")).as("chunk_fp"): _*)
  }

  /** The chunk relation for a corpus dir, read from the STORED
    * [[ChunkStore]] artifact (built on first touch in a session).
    */
  private def chunkRows(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame =
    ChunkStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      ChunkStore.tag(dir))

}
