package graft.ops

import graft.SparkSpec
import graft.etl.{Layout, Pipeline}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The end-to-end curated-mix training artifact (r13 verdict #1):
  * q_train_ready composes funnel-kept docs → survivor stride schedule
  * → packedSequences. This spec pins the three receipts the capstone
  * demands beyond the DuckDB oracle:
  *
  *   1. the packed artifact's doc set == the funnel's kept set EXACTLY
  *      (the composition trains on precisely what curation kept);
  *   2. token-exact loader replay of the WRITTEN shard-major files
  *      (the PackedReplaySpec invariant on the composed artifact);
  *   3. the within-shard order is the mixture schedule's order
  *      restricted to the shard (hash-sharding must not reorder the
  *      interleave), and the pipeline artifact row self-prices.
  */
class TrainReadySpec extends SparkSpec {
  import spark.implicits._

  /** The CorpusFunnelSpec corpus verbatim — every funnel stage
    * populated, so the kept set is a strict, known subset (docs 20,
    * 22, 40, 41 + one capped-source survivor).
    */
  private def doc(prefix: String, n: Int): String =
    (Seq("the", "and") ++ (1 to n - 2).map(i => f"$prefix$i%02d"))
      .mkString(" ")

  private lazy val evalText = doc("evl", 35)

  private lazy val dir: String = {
    val d = Files.createTempDirectory("trainready").toString
    val docs = Seq(
      (1L, evalText, "src0"),
      (2L, doc("evt", 35), "src0"),
      (10L, "tiny bad doc", "src1"),
      (50L, ("the" +: Seq.fill(20)("data")).mkString(" "), "src1"),
      (20L, doc("gdc", 21), "src2"),
      (21L, doc("gdc", 21), "src2"),
      (22L, doc("ndc", 21), "src3"),
      (23L, doc("ndc", 21) + " extratail wordsmore overhere", "src3"),
      (31L, evalText + " " + (1 to 30).map(i => f"ctt$i%02d")
        .mkString(" "), "src4"),
      (60L, doc("cpa", 40), "src5"),
      (61L, doc("cpb", 40), "src5"),
      (62L, doc("cpc", 40), "src5"),
      (40L, doc("kpa", 21), "src6"),
      (41L, doc("kpb", 21), "src6"))
    docs.map { case (id, t, s) => (id, t, "en", s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private val Budget = PackingQueries.ArtifactBudget

  /** Loader emulation (PackedReplaySpec's walk): shard dirs
    * numerically, files lexicographically, rows physically.
    */
  private def replayTokens(path: String): Seq[String] = {
    val root = new java.io.File(path)
    root.listFiles().filter(_.getName.startsWith("shard="))
      .sortBy(_.getName.stripPrefix("shard=").toInt).toSeq
      .flatMap { d =>
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .sortBy(_.getName).toSeq
          .flatMap(f => spark.read.parquet(f.toString)
            .select("toks").as[Seq[String]].collect().toSeq.flatten)
      }
  }

  test("the composed permutation's doc set == the funnel's kept set " +
    "exactly, each doc once (the kept==packed invariant's first half)") {
    val kept = CorpusQueries.stagedDocs(spark, dir)
      .filter(col("stage") === "7_kept")
      .select("doc_id").as[Long].collect().toSet
    val permDocs = PackingQueries.trainReadyPerm(spark, dir)
      .select("doc_id").as[Long].collect().toSeq
    assert(permDocs.size == permDocs.toSet.size, "each kept doc once")
    assert(permDocs.toSet == kept,
      s"perm=${permDocs.sorted} kept=${kept.toSeq.sorted}")
    // the fixture's funnel verdicts hold: eval/quality/gopher/dup/
    // near-dup/contam/cap docs are all OUT, the known keepers in
    assert(Set(20L, 22L, 40L, 41L).subsetOf(kept))
    assert(kept.intersect(Set(1L, 2L, 10L, 50L, 21L, 23L, 31L)).isEmpty)
  }

  test("token-exact loader replay: the written composed artifact == " +
    "the scheduled kept stream (second half — content equality proves " +
    "the packed doc MULTISET is the kept set)") {
    val perm = PackingQueries.trainReadyPerm(spark, dir)
    val out = s"$dir/tr.parquet"
    Layout.writeShardMajor(
      PackingQueries.packedSequences(perm, Budget), out, 16,
      posCol = "seq_id")
    val expected = perm.orderBy("shard", "pos")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .as[String].collect().toSeq
    assert(replayTokens(out) == expected)
  }

  test("within each shard the doc order IS the survivor schedule's " +
    "order restricted to that shard (hash-sharding never reorders the " +
    "stride interleave)") {
    val perm = PackingQueries.trainReadyPerm(spark, dir)
    val rows = perm
      .select("shard", "pos", "sched_key", "source", "doc_id")
      .as[(Int, Long, Long, String, Long)].collect().toSeq
    // global schedule order restricted to a shard == the shard's pos
    // order: sort each shard's rows by the GLOBAL key and compare
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._2).map(r => (r._3, r._4, r._5))
      val bySched = rs.sortBy(r => (r._3, r._4, r._5))
        .map(r => (r._3, r._4, r._5))
      assert(byPos == bySched)
    }
    // pos is dense 1..n within each shard (a packable permutation)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted == (1L to rs.size.toLong))
    }
  }

  test("pipeline artifact row: buildTrainReady writes the shard-major " +
    "composed artifact with a self-pricing report row, and it replays") {
    val r = Pipeline.artifactPhase(spark, dir,
      Pipeline.ArtifactConfig(buildTrainReady = true))
    assert(r.size == 1 && r.head.kind == "train_ready")
    assert(r.head.detail.contains("kept_docs=") &&
      r.head.detail.contains("pad_frac="), r.head.detail)
    val perm = PackingQueries.trainReadyPerm(spark, dir)
    val expected = perm.orderBy("shard", "pos")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .as[String].collect().toSeq
    assert(replayTokens(s"$dir/documents_train_ready.parquet") == expected)
    // the report's kept count is the perm's row count
    val kept = perm.count()
    assert(r.head.detail.contains(s"kept_docs=$kept"), r.head.detail)
  }

  test("q_train_mix_audit: one row per (rule, KEPT source), kept " +
    "counts sum to the kept set under each rule, shares are " +
    "probabilities, and deviations are consistent with the min/max " +
    "shard shares") {
    val kept = CorpusQueries.stagedDocs(spark, dir)
      .filter(col("stage") === "7_kept")
    val keptBySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val rows = graft.Registry.queryMap("q_train_mix_audit")(spark, dir)
      .as[(String, String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows.map(_._1).toSet == Set("hash", "stratified"))
    Seq("hash", "stratified").foreach { rule =>
      val rr = rows.filter(_._1 == rule)
      assert(rr.map(_._2).toSet == keptBySrc.keySet, rule)
      assert(rr.map(_._3).sum == keptBySrc.values.sum, rule)
      rr.foreach { case (_, src, n, g, mn, mx, dev) =>
        assert(n == keptBySrc(src))
        assert(g >= 0 && g <= 1 && mn >= 0 && mn <= mx && mx <= 1, src)
        // the worst deviation is achieved at one of the extreme shares
        // (6dp rounding of independently-rounded terms -> 2e-6 slack)
        assert(math.abs(dev - math.max(mx - g, g - mn)) < 2e-6,
          s"$rule/$src: dev=$dev g=$g mn=$mn mx=$mx")
        // < 16 kept docs guarantee empty shards, and ALL 16 count
        // (r14 review: occupied-only grids hid the starved workers)
        assert(mn == 0.0,
          s"$rule/$src: with empty shards min share must be 0")
      }
    }
  }

  test("stratified remedy (r14 verdict #5): per-(shard, source) counts " +
    "deviate <= 1 doc from n_g/16 BY CONSTRUCTION, the permutation is " +
    "still a permutation of the kept set, and within-shard order is " +
    "still the schedule's") {
    val perm = PackingQueries.trainReadyPerm(spark, dir, stratified = true)
    val rows = perm.select("shard", "source", "doc_id", "sched_key", "pos")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    // same doc set as the hash rule (the rule only MOVES docs)
    val hashDocs = PackingQueries.trainReadyPerm(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(rows.map(_._3).toSet == hashDocs)
    assert(rows.map(_._3).distinct.size == rows.size)
    // the <= 1-doc bound: every (shard, source) count is floor or ceil
    // of n_g / NumShards
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      val perShard = rs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val ng = rs.size.toLong
      val lo = ng / SampleQueries.NumShards
      val hi = if (ng % SampleQueries.NumShards == 0) lo else lo + 1
      (0 until SampleQueries.NumShards).foreach { sh =>
        val c = perShard.getOrElse(sh, 0L)
        assert(c == lo || c == hi,
          s"$src shard $sh: count $c outside {$lo,$hi} for n_g=$ng")
      }
    }
    // within-shard order is still the schedule restricted to the shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byPos = rs.sortBy(_._5).map(r => (r._4, r._2, r._3))
      assert(byPos == byPos.sorted)
      assert(rs.map(_._5).sorted == (1L to rs.size.toLong))
    }
  }

  test("a funnel that keeps ZERO docs reports kept_docs=0 instead of " +
    "crashing on an all-empty partitioned write (r14 review)") {
    import java.nio.file.Files
    val d = Files.createTempDirectory("trainready0").toString
    // every doc is benchmark (src0) -> stage 0_eval_slice, nothing kept
    Seq((1L, doc("eva", 30), "en", "src0", 100L),
      (2L, doc("evb", 30), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = Pipeline.artifactPhase(spark, d,
      Pipeline.ArtifactConfig(buildTrainReady = true))
    assert(r.size == 1 && r.head.kind == "train_ready")
    assert(r.head.detail.contains("kept_docs=0"), r.head.detail)
  }
}
