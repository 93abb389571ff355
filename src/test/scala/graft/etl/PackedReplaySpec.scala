package graft.etl

import graft.SparkSpec
import graft.ops.{PackingQueries, SampleQueries}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The packed training artifact (r11 verdict #1 — the last composition
  * step): the written shard-major sequence files must REPLAY the exact
  * permutation token stream when a loader walks shard dirs 0..15 and
  * streams each dir's files in listing order — the ShardReplaySpec
  * invariant one level up, now at TOKEN grain through the packing. Also
  * pins the artifact's self-pricing: measured padding of the written
  * files equals the analytic per-shard ceil formula (q_packing_waste's
  * packed column at this budget), and every sequence is full except
  * each shard's last.
  */
class PackedReplaySpec extends SparkSpec {
  import spark.implicits._

  private val Budget = 32 // small against the docs so packing multi-cuts

  private lazy val docsDir: String = {
    val d = Files.createTempDirectory("packspec").toString
    // variable-length docs: some longer than Budget (straddle pieces),
    // some tiny (many docs per sequence)
    val docs = (1L to 240L).map { id =>
      val n = 1 + (id % 50).toInt
      (id, (1 to n).map(j => s"w${id}x$j").mkString(" "), "en",
        s"s${id % 3}", n.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    d
  }

  private lazy val perm =
    SampleQueries.shuffleShardPerm(
      spark.read.parquet(s"$docsDir/documents.parquet"))

  /** The naive oracle: every doc's tokens concatenated in global
    * permutation order (one global sort — exactly what the artifact
    * must avoid at scale but must EQUAL in content).
    */
  private lazy val expectedTokens: Seq[String] =
    perm.orderBy("gpos")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .as[String].collect().toSeq

  /** Loader emulation: shard dirs numerically, files lexicographically,
    * rows physically, token arrays flattened in row order.
    */
  private def replayTokens(path: String): Seq[String] = {
    val root = new java.io.File(path)
    root.listFiles().filter(_.getName.startsWith("shard="))
      .sortBy(_.getName.stripPrefix("shard=").toInt).toSeq
      .flatMap { dir =>
        dir.listFiles().filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).toSeq
          .flatMap(f => spark.read.parquet(f.toString)
            .select("toks").as[Seq[String]].collect().toSeq.flatten)
      }
  }

  test("token-exact replay: written sequences == the permutation stream") {
    val out = s"$docsDir/packed.parquet"
    Layout.writeShardMajor(
      PackingQueries.packedSequences(perm, Budget), out, 16,
      posCol = "seq_id")
    assert(replayTokens(out) == expectedTokens)
  }

  test("multi-file shards (range splits mid-shard): replay still exact") {
    val out = s"$docsDir/packed48.parquet"
    Layout.writeShardMajor(
      PackingQueries.packedSequences(perm, Budget), out, 48,
      posCol = "seq_id")
    val root = new java.io.File(out)
    val perDir = root.listFiles().filter(_.getName.startsWith("shard="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(perDir.exists(_ > 1), "test should exercise multi-file dirs")
    assert(replayTokens(out) == expectedTokens)
  }

  test("only each shard's LAST sequence is padded; padding matches the " +
    "per-shard ceil formula") {
    val packed = PackingQueries.packedSequences(perm, Budget)
      .persist()
    try {
      // padded rows are exactly the per-shard max seq_id rows
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      val bad = packed
        .withColumn("last", col("seq_id") === max("seq_id").over(w))
        .filter((col("n_pad") > 0) && !col("last")).count()
      assert(bad == 0, "a non-final sequence must be exactly full")
      assert(packed.filter(col("n_tokens") + col("n_pad") =!= Budget)
        .count() == 0, "every sequence accounts for the full budget")
      // measured totals == the analytic per-shard formula the waste
      // curve prices: seqs = sum_shard ceil(tok_shard / L)
      val shardTok = perm
        .select(col("shard"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n"))
        .groupBy("shard").agg(sum("n").as("tok"))
        .select(col("shard"), col("tok"),
          expr(s"(tok + ${Budget - 1}) div $Budget").as("seqs"))
      val expSeqs = shardTok.agg(sum("seqs")).head().getLong(0)
      val expTok = shardTok.agg(sum("tok")).head().getLong(0)
      val gotSeqs = packed.count()
      val gotTok = packed.agg(sum("n_tokens")).head().getLong(0)
      val gotPad = packed.agg(sum("n_pad")).head().getLong(0)
      assert(gotSeqs == expSeqs && gotTok == expTok &&
        gotPad == gotSeqs * Budget - expTok)
    } finally packed.unpersist()
  }

  test("artifact phase writes the packed layout with a self-pricing row") {
    val r = Pipeline.artifactPhase(spark, docsDir,
      Pipeline.ArtifactConfig(packTables = Seq("documents")))
    assert(r.size == 1 && r.head.kind == "packed_sequences")
    assert(r.head.detail.contains("pad_frac="),
      s"report must carry the measured padding: ${r.head.detail}")
    // the artifact-phase write (ArtifactBudget) replays exactly too
    assert(replayTokens(s"$docsDir/documents_packed.parquet")
      == expectedTokens)
  }

  test("the budget knob holds at PRODUCTION scale: L=2048 on the sf0.01 " +
    "corpus replays token-exactly, pads only per-shard tails, and its " +
    "measured padding matches the ceil formula (r12 verdict #4)") {
    // the r11/r12 proofs ran at L=128 only (the corpus-scaled point);
    // this run is the same three invariants at the budget a real
    // training run ships, on the real testdata corpus.
    val L = 2048
    val sfDocs = spark.read.parquet(
      "/root/testdata/sf0.01/documents.parquet")
    val sfPerm = SampleQueries.shuffleShardPerm(sfDocs)
    val out = Files.createTempDirectory("pack2048").toString + "/p.parquet"
    val packed = PackingQueries.packedSequences(sfPerm, L).persist()
    try {
      Layout.writeShardMajor(packed, out, 16, posCol = "seq_id")
      // 1. token-exact loader replay
      val expected = sfPerm.orderBy("gpos")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
        .as[String].collect().toSeq
      assert(replayTokens(out) == expected)
      // 2. only each shard's last sequence is padded; budget accounted
      val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      assert(packed
        .withColumn("last", col("seq_id") === max("seq_id").over(w))
        .filter((col("n_pad") > 0) && !col("last")).count() == 0)
      assert(packed.filter(col("n_tokens") + col("n_pad") =!= L)
        .count() == 0)
      // 3. measured padding == the analytic per-shard ceil formula
      val shardTok = sfPerm
        .select(col("shard"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n"))
        .groupBy("shard").agg(sum("n").as("tok"))
        .select(col("tok"), expr(s"(tok + ${L - 1}) div $L").as("seqs"))
      val expSeqs = shardTok.agg(sum("seqs")).head().getLong(0)
      val expTok = shardTok.agg(sum("tok")).head().getLong(0)
      val gotPad = packed.agg(sum("n_pad")).head().getLong(0)
      assert(packed.count() == expSeqs)
      assert(gotPad == expSeqs * L - expTok)
      // the measured fraction, recorded beside the L=128 row's ~3.8%:
      // a real-corpus 2048 run pads only per-shard remainders
      val padFrac = gotPad.toDouble / (expSeqs * L)
      info(f"L=$L measured pad_frac=$padFrac%.4f " +
        f"(sequences=$expSeqs tokens=$expTok)")
      assert(padFrac >= 0.0 && padFrac < 1.0)
    } finally packed.unpersist()
  }
}
