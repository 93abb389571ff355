package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.BpeQueries

/** BPE merge learning at SHIPPABLE merge counts (r9 verdict #5): the
  * declared q_bpe_merges query stays at 10 merges so its unrolled DuckDB
  * oracle is tractable, but the vocabulary-grain claim ("rounds touch
  * MBs, not the corpus" — production tables run 30k–50k merges, Sennrich
  * et al. 2016) needs a measurement, not an argument. This main runs the
  * SAME driver loop ([[BpeQueries.learnAndApply]] — one code path, no
  * fork) to 500+ merges, recording the per-round wall-time curve and
  * compression checkpoints, and HARD-FAILS (require) if either BPE
  * invariant breaks:
  *
  *  - argmax pair counts are monotone non-increasing in merge rank
  *    (merging the best pair can only create pairs whose counts are
  *    bounded by pre-merge counts of their constituents);
  *  - corpus-weighted total symbols strictly decrease while merges
  *    apply (every applied merge removes at least one symbol), so
  *    encode compression chars/syms strictly improves.
  *
  * Usage: runMain graft.tools.BpeScale [sfDir|synth:N] [numMerges] [outFile]
  * Writes the curve as JSON (committed as BPE_SCALE.json; summarized in
  * SCALE.md).
  *
  * The driver testdata cannot host the 500-merge measurement: its
  * `documents` table has 31 distinct words (merge capacity 89 rules —
  * measured; the loop reaches its fixpoint and stops). `synth:N`
  * generates a deterministic Zipf word-frequency corpus with N distinct
  * words (hash-derived spellings, count ∝ 1/rank) purely for this
  * measurement — real vocabularies are 10^6–10^8 words, so a richer
  * word table is exactly what "vocabulary grain" means; the declared
  * oracle-checked queries still run only on the driver testdata.
  */
object BpeScale {

  /** Write a documents.parquet of `n` distinct deterministic words with
    * Zipf counts under a temp dir; returns the dir. Shared with
    * [[BpeSweep]] (same corpus family for both measurement mains). */
  private[tools] def synthCorpusFor(s: SparkSession, n: Int): String =
    synthCorpus(s, n)

  private def synthCorpus(s: SparkSession, n: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-synth").toString
    val letters = "abcdefghijklmnopqrstuvwxyz"
    val words = (0 until n).map { w =>
      var x = (w * 2654435761L + 987654321L) & 0x7fffffffL
      val len = 5 + (x % 6).toInt
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        x = (x * 48271) % 2147483647L
        sb.append(letters((x % 26).toInt))
      }
      sb.toString
    }
    // count ∝ n/rank, floor 1; each word's occurrences stay adjacent —
    // BPE learning is frequency-weighted, order-independent
    import s.implicits._
    val docs = words.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(math.max(1, n / (i + 1)))(w) }
      .grouped(200).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "synth") }
      .toSeq.toDF("doc_id", "text", "source")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val sfArg = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val numMerges = if (args.length > 1) args(1).toInt else 500
    val outFile = if (args.length > 2) args(2) else "BPE_SCALE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir =
      if (sfArg.startsWith("synth:"))
        synthCorpus(spark, sfArg.stripPrefix("synth:").toInt)
      else sfArg

    val CheckEvery = 50
    val roundSecs = scala.collection.mutable.Buffer.empty[Double]
    // (rank, syms_total, chars_total) at each checkpoint — aggregated
    // over the materialized (checkpointed) state, so each checkpoint is
    // one vocabulary-grain agg job.
    val checkpoints =
      scala.collection.mutable.Buffer.empty[(Int, Long, Long)]
    def snapshot(rank: Int, v: org.apache.spark.sql.DataFrame): Unit = {
      val r = v.agg(
        sum(col("cnt") * size(col("syms"))).as("syms_total"),
        sum(col("cnt") * length(col("word"))).as("chars_total")).head()
      checkpoints += ((rank, r.getLong(0), r.getLong(1)))
    }
    val t0 = System.nanoTime()
    val (merges, vFinal) = BpeQueries.learnAndApply(spark, sfDir, numMerges,
      (rank, secs, v) => {
        roundSecs += secs
        if (rank % CheckEvery == 0) snapshot(rank, v)
        if (rank % 25 == 0)
          System.err.println(f"[bpe-scale] round $rank%4d ${secs}%6.3f s")
      })
    try {
      if (checkpoints.isEmpty || checkpoints.last._1 != merges.length)
        snapshot(merges.length, vFinal)
    } finally {
      vFinal.unpersist(); graft.ops.Checkpoints.free(vFinal)
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // Invariant 1: argmax pair counts monotone non-increasing.
    merges.sliding(2).foreach {
      case Seq((r1, l1, rh1, c1), (r2, l2, rh2, c2)) =>
        require(c1 >= c2,
          s"pair count increased: rank $r1 ($l1,$rh1)=$c1 -> " +
            s"rank $r2 ($l2,$rh2)=$c2")
      case _ =>
    }
    // Invariant 2: total symbols strictly decrease between checkpoints
    // (compression strictly improves while merges apply).
    val cps = checkpoints.toList
    cps.zip(cps.tail).foreach { case ((ra, sa, _), (rb, sb, _)) =>
      require(sb < sa,
        s"syms_total did not decrease: rank $ra=$sa -> rank $rb=$sb")
    }
    val chars = checkpoints.last._3

    def f3(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def f6(d: Double) =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    val curve = roundSecs.map(f3).mkString("[", ",", "]")
    val cks = checkpoints.map { case (r, s, c) =>
      s"""{"rank":$r,"syms_total":$s,"compression_x":${f6(c.toDouble / s)}}"""
    }.mkString("[", ",", "]")
    // Bucketed curve summary: mean secs per 50-round bucket — flat
    // buckets are the measured form of "per-round cost does not grow
    // with merge rank" (state is re-checkpointed every round; lineage
    // and row count do not accumulate).
    val buckets = roundSecs.grouped(CheckEvery).zipWithIndex.map {
      case (b, i) => s"""{"rounds":"${i * CheckEvery + 1}-${i * CheckEvery +
        b.length}","mean_sec":${f3(b.sum / b.length)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"corpus":"$sfArg","merges_requested":$numMerges,""" +
        s""""merges_learned":${merges.length},"wall_sec":${f3(wall)},""" +
        s""""chars_total":$chars,""" +
        s""""first_pair_count":${merges.head._4},""" +
        s""""last_pair_count":${merges.last._4},""" +
        s""""curve_buckets":$buckets,"checkpoints":$cks,""" +
        s""""round_secs":$curve}"""
    Files.write(Paths.get(outFile), json.getBytes(StandardCharsets.UTF_8))
    println(s"[bpe-scale] ${merges.length} merges in ${f3(wall)} s; " +
      s"compression ${f6(chars.toDouble / checkpoints.last._2)}x; wrote $outFile")
    spark.stop()
  }
}
