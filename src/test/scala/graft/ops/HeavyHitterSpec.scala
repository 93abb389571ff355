package graft.ops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.util.Random

/** The two sketch-accelerated exact operators added in round 5:
  *
  *   - q_heavy_hitters: per-partition SpaceSaving candidate generation
  *     + exact recount. The guarantee that makes the output EXACT (not
  *     approximate) is the superset property — every item with count >
  *     N/k survives the sketch — which this spec checks differentially
  *     against brute force on streams where eviction is actually
  *     exercised (vocabulary >> k), not just on the tiny-vocab bench
  *     corpus where the sketch never evicts.
  *
  *   - q_contamination_bloom: Bloom-bucket semi-join pre-pass in front
  *     of the exact contamination verify. Output-transparency (bloom
  *     false positives never change the result) is checked by comparing
  *     against plain q_contamination row-for-row on real testdata.
  */
class HeavyHitterSpec extends SparkSpec {
  import spark.implicits._

  test("spaceSavingKeys superset property on an eviction-heavy stream") {
    val rnd = new Random(42)
    val k = 100
    // Zipf-ish: a few hot items over a 5000-item long tail.
    val stream = Seq.fill(20000) {
      val r = rnd.nextInt(100)
      if (r < 30) s"hot${rnd.nextInt(3)}"          // 3 items, ~10% each
      else if (r < 45) s"warm${rnd.nextInt(20)}"   // 20 items, ~0.75% each
      else s"cold${rnd.nextInt(5000)}"             // long tail
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    val survivors = TextQueries.spaceSavingKeys(stream.iterator, k).toSet
    assert(survivors.size <= k)
    val mustSurvive = exact.collect { case (t, c) if c * k > n => t }
    assert(mustSurvive.nonEmpty && mustSurvive.size < k / 2) // test has teeth
    val lost = mustSurvive.filterNot(survivors.contains)
    assert(lost.isEmpty, s"heavy hitters evicted from the sketch: $lost")
  }

  test("SpaceSavingAgg: merged candidates keep the superset guarantee " +
    "across many partial buffers (vocab >> counters, eviction + merge)") {
    val rnd = new Random(7)
    val k = 100
    val stream = Seq.fill(30000) {
      val r = rnd.nextInt(100)
      if (r < 30) s"hot${rnd.nextInt(3)}"
      else if (r < 45) s"warm${rnd.nextInt(20)}"
      else s"cold${rnd.nextInt(8000)}"
    }
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size.toLong
    // 13 partitions -> 13 partial SS buffers merged through the final
    // Misra-Gries reductions; the 2k margin must absorb the merge error.
    val cands = stream.toDF("term").repartition(13)
      .agg(graft.functions.SpaceSavingAgg.candidates(col("term"), k).as("c"))
      .select(explode(col("c")).as("t")).as[String].collect().toSet
    assert(cands.size <= 2 * k, s"buffer exceeded 2k: ${cands.size}")
    val mustSurvive = exact.collect { case (t, c) if c * k > n => t }
    assert(mustSurvive.nonEmpty && mustSurvive.size < k / 2)
    val lost = mustSurvive.filterNot(cands.contains)
    assert(lost.isEmpty, s"heavy hitters lost in the merged aggregate: $lost")
  }

  test("SpaceSavingAgg buffer serde round-trips arbitrary contents") {
    val rnd = new Random(3)
    val agg = graft.functions.SpaceSavingAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)
    for (_ <- 1 to 20) {
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      (0 until rnd.nextInt(40)).foreach { _ =>
        // non-ASCII + empty keys exercise the UTF-8 length-prefix path
        val key = rnd.nextInt(4) match {
          case 0 => ""
          case 1 => "日本語" + rnd.nextInt(10)
          case _ => "term" + rnd.nextInt(1000)
        }
        m.update(key, rnd.nextLong().abs)
      }
      assert(agg.deserialize(agg.serialize(m)) == m)
    }
  }

  test("q_heavy_hitters is exact under active eviction (vocab >> k)") {
    val d = Files.createTempDirectory("hhspec").toString
    // 1500 docs, ~4500 distinct bigrams (>> HeavyK=1024, so per-partition
    // sketches evict); engineered truth: "hot hot" (count 3000) and
    // "warm warm" (count 15) clear N/1024, the unique filler does not.
    val docs = (1 to 1500).map { i =>
      val extra = if (i % 100 == 0) " warm warm" else ""
      (i.toLong, s"hot hot hot u${i}x u${i}y u${i}z$extra", "en", "src1")
    }.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")

    val got = Registry.queryMap("q_heavy_hitters")(spark, d)
      .select("term", "cnt").as[(String, Long)].collect().toMap
    // brute force over the same definition of the bigram stream
    val toks = col("toks")
    val exploded = spark.read.parquet(s"$d/documents.parquet")
      .withColumn("toks", split(trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")), " "))
      .select(explode(when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - lit(2)),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>"))).as("term"))
    val n = exploded.count()
    val expected = exploded.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * TextQueries.HeavyK > n)
      .as[(String, Long)].collect().toMap
    assert(expected.contains("hot hot") && expected.contains("warm warm"))
    assert(got == expected, s"sketch+recount diverged from brute force")
  }

  test("q_contamination_bloom matches plain q_contamination row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val plain = Registry.queryMap("q_contamination")(spark, dir)
      .select("doc_id", "n_ngrams", "n_hits", "overlap_frac", "contaminated")
      .collect().map(_.toSeq)
    val bloom = Registry.queryMap("q_contamination_bloom")(spark, dir)
      .collect().map(_.toSeq)
    assert(plain.nonEmpty)
    assert(bloom.toSeq == plain.toSeq)
  }

  test("q_contamination_bloom plan: pre-filter stays a broadcast " +
    "semi-join even when the eval set cannot broadcast; the verify " +
    "join degrades to a shuffle of pre-filter survivors only") {
    // AQE off for a stable, traversable plan tree (as PlanShapeSpec).
    val saved = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val mk = () => Registry
      .queryMap("q_contamination_bloom")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    try {
      // Small eval set (the normal case): both semi-joins broadcast.
      val p = mk()
      val semis = p.collect {
        case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT SEMI" => j
      }
      assert(semis.size >= 2, s"expected bit + ngram broadcast semi-joins:\n$p")
      // Eval-set-beyond-broadcast-size case (the variant's reason to
      // exist), simulated by disabling auto-broadcast: the bit
      // pre-filter MUST stay broadcast (it carries the explicit hint —
      // integer buckets sized to the eval set, always broadcastable),
      // while the unhinted exact-verify join falls back to a shuffled
      // semi-join whose corpus side is pre-filter SURVIVORS, not the
      // n-gram-grain corpus.
      val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p2 = try mk()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
      val bcSemis = p2.collect {
        case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT SEMI" => j
      }
      assert(bcSemis.size == 1,
        s"only the hinted bit pre-filter may broadcast:\n$p2")
      val shuffledVerify = p2.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.joinType.sql == "LEFT SEMI" => j
      }
      assert(shuffledVerify.nonEmpty,
        s"verify must degrade to a shuffled semi-join, not a broadcast:\n$p2")
      // and the pre-filter sits BELOW the verify join: survivors, not
      // the raw exploded corpus, feed the shuffle
      assert(shuffledVerify.exists(_.exists(_ eq bcSemis.head)),
        s"pre-filter must feed the verify join's corpus side:\n$p2")
    } finally spark.conf.set("spark.sql.adaptive.enabled", saved)
  }
}
