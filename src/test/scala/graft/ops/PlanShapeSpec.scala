package graft.ops

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-SHAPE assertions for the SCALE.md claims (VERDICT r4 item 7):
  * a claim like "the stored index side is scan-only" or "this is an
  * equi-join, not a cartesian" is only real if the physical plan shows
  * it. AQE is disabled per-test so each query yields one stable plan
  * tree to traverse (same reasoning as PlanAudit).
  */
class PlanShapeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Build df's executed plan with AQE off (stable tree, no runtime
    * re-plan wrappers) and optionally broadcast joins disabled (to
    * exercise the large-scale join path a tiny test input would
    * otherwise hide behind a BroadcastExchange).
    */
  private def plan(mk: => DataFrame, noBroadcast: Boolean = false): SparkPlan = {
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val savedBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (noBroadcast) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try mk.queryExecution.executedPlan
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }

  /** Children INCLUDING the plan cached behind an InMemoryTableScan —
    * r18: several queries now persist a shared intermediate (the
    * §3.3/§5 materializations), which moves the stored-artifact scans
    * these assertions govern INSIDE the InMemoryRelation. The claims
    * ("scan-only into its join", "no cartesian") are about the plan
    * that computes the relation, wherever it sits — so the walk
    * follows the cached plan too.
    */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p.children ++ (p match {
    case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(im.relation.cachedPlan)
    case _ => Nil
  })

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(allNodes)

  private def scansOf(p: SparkPlan, pathPart: String): Seq[FileSourceScanExec] =
    allNodes(p).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(pathPart)) => f
    }

  private def contains(p: SparkPlan, pathPart: String): Boolean =
    scansOf(p, pathPart).nonEmpty

  /** Root-to-target node path (reference equality), if target is in p. */
  private def pathTo(p: SparkPlan, target: SparkPlan): Option[List[SparkPlan]] =
    if (p eq target) Some(List(p))
    else kids(p).view.flatMap(c => pathTo(c, target))
      .headOption.map(p :: _)

  private def isJoin(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.joins.BaseJoinExec => true
    case _ => false
  }

  test("q_dedup_incremental: stored band-index side is scan-only " +
    "(no shuffle Exchange, no Window above the bucketed artifact scans)") {
    // Broadcast disabled: at test scale the planner would broadcast the
    // tiny index and hide the exact shape that matters at 100 TB, where
    // the index side can never broadcast.
    val p = plan(Registry.queryMap("q_dedup_incremental")(spark, dir),
      noBroadcast = true)
    // both stored artifacts are read...
    assert(contains(p, "_standing_bands"), s"expected band-index scan:\n$p")
    assert(contains(p, "_standing_shingles"), s"expected shingle-store scan:\n$p")
    // ...and each index scan's rows flow into their FIRST join with no
    // shuffle Exchange or Window in between: the bucketed layout
    // satisfies the join's distribution straight off the scan (VERDICT
    // r4 defect #2 was a window count over the whole index per run).
    // Exchanges ABOVE that join are fine — they move the already-reduced
    // candidate set, not the index.
    for (tbl <- Seq("_standing_bands", "_standing_shingles");
         scan <- scansOf(p, tbl)) {
      val path = pathTo(p, scan).getOrElse(fail(s"no path to $tbl scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored $tbl must reach its probe join without a shuffle:\n$p")
      assert(!belowJoin.exists(_.isInstanceOf[WindowExec]),
        s"stored $tbl must not be re-windowed at read time:\n$p")
    }
    // the hot-bucket cap is a pushed parquet predicate on the stored bsz
    assert(scansOf(p, "_standing_bands")
      .exists(_.metadata("PushedFilters").contains("bsz")),
      s"bsz cap must reach the band-index scan as a pushed filter:\n$p")
  }

  test("q_range_join: bucketed decomposition is an equi-join " +
    "(no BroadcastNestedLoop, no CartesianProduct)") {
    val p = plan(Registry.queryMap("q_range_join")(spark, dir),
      noBroadcast = true)
    assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
      p.collect { case j: CartesianProductExec => j }.isEmpty,
      s"range join must decompose to an equi-join:\n$p")
  }

  test("q_doc_dedup and q_dedup_embedding: LSH candidate generation is " +
    "an equi-join (no BroadcastNestedLoop, no CartesianProduct)") {
    for (q <- Seq("q_doc_dedup", "q_dedup_embedding")) {
      val p = plan(Registry.queryMap(q)(spark, dir), noBroadcast = true)
      assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
        p.collect { case j: CartesianProductExec => j }.isEmpty,
        s"$q must bucket, not all-pairs:\n$p")
    }
  }

  test("q_ann_ivf: centroid passes broadcast; inverted-list probe is a " +
    "broadcast-hash join; stored cells are scan-only into the probe") {
    val p = plan(Registry.queryMap("q_ann_ivf")(spark, dir))
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"inverted-list probe must be a broadcast-hash join:\n$p")
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty,
      s"no cartesian product anywhere in IVF:\n$p")
    // the index is the STORED IvfIndex artifact, and its cell rows
    // reach the probe join without a shuffle (scan-only claim)
    assert(contains(p, "ivfcells"), s"expected stored ivf-cells scan:\n$p")
    for (scan <- scansOf(p, "ivfcells")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to ivfcells scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored cells must reach the probe join without a shuffle:\n$p")
    }
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 8,
      s"IVF should shuffle only for windows/aggs (got $shuffles):\n$p")
  }

  test("q_ann_ivfpq: probe side broadcasts into the cell-membership " +
    "join; stored codes are scan-only; no cartesian") {
    val p = plan(Registry.queryMap("q_ann_ivfpq")(spark, dir))
    assert(allNodes(p).collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"probed-candidate join must be broadcast-hash:\n$p")
    // BroadcastNestedLoopJoin appears only as the 1-row metric-assembly
    // crossJoins (rec × mrr × probed-fraction) — sanctioned; what must
    // not appear is a partition-explosive CartesianProduct anywhere in
    // the candidate/scoring path (cached subplans included).
    assert(allNodes(p).collect { case j: CartesianProductExec => j }.isEmpty,
      s"no cartesian product in the composition:\n$p")
    // the ADC leg reads the STORED vec_id-bucketed codes table, and the
    // codes rows reach their join without shuffling (scan-only claim —
    // the composition restricts WHICH codes are read, it never
    // re-shuffles the resident index)
    assert(contains(p, "pqcodes"), s"expected stored pq-codes scan:\n$p")
    for (scan <- scansOf(p, "pqcodes")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to pqcodes scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored codes must reach their join without a shuffle:\n$p")
    }
  }

  test("q_dedup_spans: stored span artifact is scan-only — sh-join and " +
    "dup-set distinct run without shuffling either bucketed table") {
    val p = plan(Registry.queryMap("q_dedup_spans")(spark, dir),
      noBroadcast = true)
    assert(contains(p, "spanrows"), s"expected span-rows scan:\n$p")
    assert(contains(p, "spanset"), s"expected span-set scan:\n$p")
    for (tbl <- Seq("spanrows", "spanset"); scan <- scansOf(p, tbl)) {
      val path = pathTo(p, scan).getOrElse(fail(s"no path to $tbl scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored $tbl must reach the sh-join without a shuffle:\n$p")
    }
    // the delta-merge agg (sum nd per sh, then the MinDocs threshold)
    // is bucket-local: the spanset leg reaches the sh-join through its
    // agg with no exchange — covered by the loop above, which walks
    // THROUGH the agg node to the join. A pushed nd filter is
    // deliberately absent: per-row nd is a delta summand since the r7
    // exact-append change, so the threshold can only apply post-merge.
    // all that may shuffle is the reduced output: doc-grain agg + sort
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 2,
      s"read path should shuffle only doc-agg + sort (got $shuffles):\n$p")
  }

  test("q_dedup_substrings: stored charspans artifact is scan-only — the " +
    "same exchange-free read shape as the word family") {
    val p = plan(Registry.queryMap("q_dedup_substrings")(spark, dir),
      noBroadcast = true)
    assert(contains(p, "charspans"), s"expected charspans scan:\n$p")
    for (scan <- scansOf(p, "charspans")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to charspans scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored charspans tables must reach the sh-join unshuffled:\n$p")
    }
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 2,
      s"read path should shuffle only doc-agg + sort (got $shuffles):\n$p")
  }

  test("q_chunk_dedup: dedup agg is exchange-free off the " +
    "chunk_fp-bucketed stored chunk table") {
    val p = plan(Registry.queryMap("q_chunk_dedup")(spark, dir),
      noBroadcast = true)
    assert(contains(p, "_chunks"), s"expected stored chunk scan:\n$p")
    for (scan <- scansOf(p, "_chunks")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to chunks scan"))
      val belowAgg = path.reverse.takeWhile {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case _ => true
      }
      assert(!belowAgg.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"fp-grain agg must read the bucketed scan without a shuffle:\n$p")
    }
    // only the reduced dup-fingerprint output moves for the final sort
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 1,
      s"only the output sort may shuffle (got $shuffles):\n$p")
  }

  test("q_stratified_mink: the reservoir sample is window-free — one " +
    "partial/final aggregate, no per-stratum sort of the input") {
    val p = plan(Registry.queryMap("q_stratified_mink")(spark, dir))
    assert(!p.exists(_.isInstanceOf[WindowExec]),
      s"min-k reservoir must not plan a window:\n$p")
    // partial agg below the stratum exchange + final above + output sort
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 2,
      s"only the stratum agg + output sort may shuffle (got $shuffles):\n$p")
    val aggs = p.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
    }
    assert(aggs.nonEmpty, s"expected an imperative aggregate pair:\n$p")
  }

  test("q_diverse_sample: per-cell min-k agg is exchange-free off the " +
    "cell-bucketed stored IVF scan, window-free") {
    val p = plan(Registry.queryMap("q_diverse_sample")(spark, dir))
    assert(!p.exists(_.isInstanceOf[WindowExec]),
      s"min-k reservoir must not plan a window:\n$p")
    assert(contains(p, "_ivfcells"), s"expected stored IVF cell scan:\n$p")
    for (scan <- scansOf(p, "_ivfcells")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to cell scan"))
      val belowAgg = path.reverse.takeWhile {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case _ => true
      }
      assert(!belowAgg.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"cell-grain agg must read the bucketed scan without a shuffle:\n$p")
    }
    // only the reduced <= k x cells output moves for the final sort
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 1,
      s"only the output sort may shuffle (got $shuffles):\n$p")
  }

  test("q_pmi_bigrams: the corpus is tokenized exactly twice — the " +
    "n1/n2 totals derive from the vocab-grain count relations, and the " +
    "repeated uni/biAll subtrees collapse to one execution each via " +
    "exchange reuse (r7 verdict: the 4-pass shape re-scanned the corpus " +
    "for each total)") {
    val p = plan(Registry.queryMap("q_pmi_bigrams")(spark, dir))
    // Executed scan count: ReusedExchangeExec is a leaf reference, so
    // collect sees only the subtrees that actually execute.
    val docScans = scansOf(p, "documents.parquet").length
    assert(docScans == 2,
      s"expected exactly 2 executed documents scans (uni + bigram), got $docScans:\n$p")
    val reused = p.collect {
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r
    }
    assert(reused.nonEmpty,
      s"expected the repeated count-relation subtrees to plan as ReusedExchange:\n$p")
  }

  test("q_source_overlap: per-span source-set agg is exchange-free off " +
    "the sh-bucketed span rows") {
    val p = plan(Registry.queryMap("q_source_overlap")(spark, dir),
      noBroadcast = true)
    assert(contains(p, "spanrows"), s"expected span-rows scan:\n$p")
    for (scan <- scansOf(p, "spanrows")) {
      val path = pathTo(p, scan).getOrElse(fail("no path to spanrows scan"))
      val belowAgg = path.reverse.takeWhile {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
        case _ => true
      }
      assert(!belowAgg.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"sh-grain agg must read the bucketed scan without a shuffle:\n$p")
    }
    // remaining shuffles move source pairs (tiny): pair agg + sort
    val shuffles = p.collect { case e: ShuffleExchangeExec => e }.length
    assert(shuffles <= 2,
      s"only the pair agg + sort may shuffle (got $shuffles):\n$p")
  }

  test("q_shuffle_shard: the corpus-scale window is PARTITIONED (by " +
    "shard); the only single-partition window sits above the 16-row " +
    "offset agg; offsets join back by broadcast") {
    val p = plan(Registry.queryMap("q_shuffle_shard")(spark, dir))
    assert(p.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"offset join must be broadcast-hash:\n$p")
    // every window on the raw documents path must be partitioned —
    // a global ROW_NUMBER over the corpus is exactly what this query
    // exists to avoid. The empty-partition window (offset prefix sum)
    // must sit above an aggregate (the 16-row shard-count relation).
    p.collect { case w: WindowExec => w }.foreach { w =>
      if (w.partitionSpec.isEmpty) {
        val below = pathTo(p, w).getOrElse(fail("no path to window"))
        assert(w.exists {
          case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
          case _ => false
        }, s"global window must read the shard-count agg, not the corpus:\n$below")
      }
    }
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty &&
      p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no non-equi join anywhere:\n$p")
  }

  test("q_dedup_containment: candidate generation is equi-keyed off the " +
    "df-capped inverted index — no cartesian, no nested-loop join") {
    val p = plan(Registry.queryMap("q_dedup_containment")(spark, dir),
      noBroadcast = true)
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty &&
      p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"containment must bucket on rare n-grams, not all-pairs:\n$p")
    // the df-cap is an aggregate-then-filter on the inverted index —
    // a HAVING, not a post-join filter on the pair stream
    assert(p.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty, s"expected the df-cap aggregate:\n$p")
  }

  test("q_containment_incremental: stored containment-index sides are " +
    "scan-only (no shuffle above the bucketed cngrams/cdocs scans " +
    "before their first join); no cartesian") {
    val p = plan(Registry.queryMap("q_containment_incremental")(spark, dir),
      noBroadcast = true)
    assert(contains(p, "_cngrams"), s"expected stored posting scan:\n$p")
    assert(contains(p, "_cdocs"), s"expected stored doc-array scan:\n$p")
    for (tbl <- Seq("_cngrams", "_cdocs"); scan <- scansOf(p, tbl)) {
      val path = pathTo(p, scan).getOrElse(fail(s"no path to $tbl scan"))
      val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
      assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"stored $tbl must reach its probe join without a shuffle:\n$p")
    }
    assert(p.collect { case j: CartesianProductExec => j }.isEmpty,
      s"no cartesian anywhere in the incremental probe:\n$p")
  }

  test("q_embedding_prototypicality: centroids aggregate before the " +
    "broadcast join; the rank window is label-partitioned") {
    val p = plan(Registry.queryMap("q_embedding_prototypicality")(spark, dir))
    val bhj = p.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"centroid join must be broadcast-hash:\n$p")
    // the broadcast (centroid) side must contain the label aggregate —
    // the corpus is scored against L reduced rows, not joined raw
    bhj.foreach { j =>
      val bcSide = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
        case _ => j.right
      }
      assert(bcSide.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }, s"broadcast side must be the aggregated centroid relation:\n$j")
    }
    // every window is label-partitioned (no single-partition rank)
    p.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"rank window must partition by label:\n$p")
    }
  }

  test("q_dedup_image / q_dedup_audio: stored band postings reach the " +
    "candidate self-join exchange-free (bk bucketing == the join key)") {
    for (q <- Seq("q_dedup_image", "q_dedup_audio")) {
      val p = plan(Registry.queryMap(q)(spark, dir), noBroadcast = true)
      // both stored tables are read; the band postings feed the
      // candidate self-join with no shuffle between scan and join —
      // the single packed band key bk is the bucketing key, which is
      // the whole point of packing (bi, bv) into one column
      assert(contains(p, "_mband"), s"$q must read stored postings:\n$p")
      assert(contains(p, "_msig"), s"$q must read stored signatures:\n$p")
      for (scan <- scansOf(p, "_mband")) {
        val path = pathTo(p, scan).getOrElse(fail("no path to _mband scan"))
        val belowJoin = path.reverse.takeWhile(n => !isJoin(n))
        assert(!belowJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
          s"$q: stored postings must reach the self-join " +
            s"without a shuffle:\n$p")
      }
      assert(p.collect { case j: BroadcastNestedLoopJoinExec => j }.isEmpty &&
        p.collect { case j: CartesianProductExec => j }.isEmpty,
        s"$q must band, not all-pairs:\n$p")
    }
  }

  test("q_mixture_schedule: no single-partition window (the rank is " +
    "source-partitioned; the total order is a range-partitioned sort)") {
    val p = plan(Registry.queryMap("q_mixture_schedule")(spark, dir))
    p.collect { case w: WindowExec => w }.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"rank window must partition by source:\n$p")
    }
  }

  test("q_domain_cap: rank/cumsum windows are source-partitioned " +
    "(never single-partition) and the per-source agg adds no exchange " +
    "above the window") {
    val p = plan(Registry.queryMap("q_domain_cap")(spark, dir))
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"expected the cumsum window:\n$p")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"cap window must partition by source:\n$p")
      // the groupBy(source) above reuses the window's source
      // partitioning: no shuffle may sit between the window and the
      // aggregate that consumes it
      val above = pathTo(p, w).get.dropRight(1)
      val belowFirstAgg = above.reverse.takeWhile(n =>
        !n.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
      assert(belowFirstAgg.forall(!_.isInstanceOf[ShuffleExchangeExec]),
        s"per-source agg re-shuffled above the source window:\n$p")
    }
  }

  test("q_token_entropy: window-free, join-free — two data-parallel " +
    "aggs are the whole query") {
    val p = plan(Registry.queryMap("q_token_entropy")(spark, dir))
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      s"entropy must not use windows:\n$p")
    assert(p.collect { case j if isJoin(j) => j }.isEmpty,
      s"entropy must not join:\n$p")
  }

  test("q_quantile_discrete: the global cumulative window runs on the " +
    "REDUCED histogram relation — an aggregate sits between the window " +
    "and the corpus scan") {
    val p = plan(Registry.queryMap("q_quantile_discrete")(spark, dir))
    val wins = p.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, s"expected the cumulative window:\n$p")
    wins.foreach { w =>
      assert(w.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }, s"window consumes the raw corpus (histogram agg missing below it):\n$p")
    }
  }

  test("q_k_anonymity: window-free; the only join is the broadcast of " +
    "the 1-row totals relation") {
    val p = plan(Registry.queryMap("q_k_anonymity")(spark, dir))
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      s"k-anonymity must not use windows:\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"no cartesian allowed:\n$p")
    p.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      // the broadcast side must be an aggregate output, never a scan
      assert(j.children.exists(_.exists {
        case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
        case _ => false
      }), s"broadcast side is not the reduced totals relation:\n$p")
    }
  }

  test("q_bm25: serves from the stored LexIndex scan-only — the " +
    "documents table appears NOWHERE in the plan; the term predicate " +
    "pushes into the posting scan and bucket-prunes it") {
    // ensure the index exists (first touch builds), then take the plan
    Registry.queryMap("q_bm25")(spark, dir).collect()
    val p = plan(Registry.queryMap("q_bm25")(spark, dir))
    assert(!contains(p, "documents.parquet"),
      s"retrieval must not rescan the corpus:\n$p")
    val posts = scansOf(p, "_lpost")
    assert(posts.nonEmpty, s"expected stored posting scan:\n$p")
    // the fixed query's terms reach parquet as pushed In filters...
    assert(posts.exists(_.metadata("PushedFilters").contains("In(term")),
      s"term IN (...) must push into the posting scan:\n$p")
    // ...the stop-term df cap pushes too (r15 governance: the cap is a
    // LITERAL on the stored df column precisely so a stopword's
    // corpus-sized posting list is pruned at the source)...
    assert(posts.exists(_.metadata("PushedFilters")
        .contains("LessThanOrEqual(df")),
      s"df <= cap must push into the posting scan:\n$p")
    // ...and prune buckets: a 3-term query reads at most 3 of the
    // bucketed files (the 100 TB claim: query cost ~ its posting
    // lists, not the index size)
    posts.foreach { s =>
      val sel = s.optionalBucketSet
      assert(sel.isDefined && sel.get.cardinality() < s.relation
        .bucketSpec.get.numBuckets,
        s"posting scan must bucket-prune:\n$p")
    }
  }

  test("q_ql_dirichlet: same serving shape as q_bm25 — no corpus " +
    "scan, pushed term + df-cap literals, bucket-pruned postings " +
    "(the one-artifact-serves-every-scorer claim, checked on the " +
    "second scorer)") {
    Registry.queryMap("q_ql_dirichlet")(spark, dir).collect()
    val p = plan(Registry.queryMap("q_ql_dirichlet")(spark, dir))
    assert(!contains(p, "documents.parquet"),
      s"retrieval must not rescan the corpus:\n$p")
    val posts = scansOf(p, "_lpost")
    assert(posts.nonEmpty, s"expected stored posting scan:\n$p")
    assert(posts.exists(_.metadata("PushedFilters").contains("In(term")),
      s"term IN (...) must push into the posting scan:\n$p")
    assert(posts.exists(_.metadata("PushedFilters")
        .contains("LessThanOrEqual(df")),
      s"df <= cap must push into the posting scan:\n$p")
    posts.foreach { s =>
      val sel = s.optionalBucketSet
      assert(sel.isDefined && sel.get.cardinality() < s.relation
        .bucketSpec.get.numBuckets,
        s"posting scan must bucket-prune:\n$p")
    }
  }

  test("q_prf_expansion: the RETURNED ranking plan serves from the " +
    "stored LexIndex only — the corpus touch (tokenizing the K " +
    "feedback docs) happens in the eager mining stage, never in the " +
    "serving subtree") {
    Registry.queryMap("q_prf_expansion")(spark, dir).collect()
    val p = plan(Registry.queryMap("q_prf_expansion")(spark, dir))
    assert(!contains(p, "documents.parquet"),
      s"the serving plan must not scan the corpus:\n$p")
    val posts = scansOf(p, "_lpost")
    assert(posts.nonEmpty, s"expected stored posting scan:\n$p")
    assert(posts.exists(_.metadata("PushedFilters").contains("In(term")),
      s"base+expansion terms must push into the posting scan:\n$p")
    posts.foreach { s =>
      val sel = s.optionalBucketSet
      assert(sel.isDefined && sel.get.cardinality() < s.relation
        .bucketSpec.get.numBuckets,
        s"posting scan must bucket-prune:\n$p")
    }
  }

  test("q_hybrid_fusion lexical leg (LexIndex.scorePanel): the panel " +
    "term universe and the stop-term df cap push into the bucket-" +
    "pruned posting scan, attribution is a broadcast join, and the " +
    "corpus appears nowhere in the scoring subtree") {
    val (post, stats) = LexIndex.buildOrLoad(spark,
      graft.Tables.par(spark, dir, "documents"), LexIndex.tag(dir))
    import spark.implicits._
    val qt = Seq((1L, "spark"), (1L, "join"), (2L, "query"))
      .toDF("query_id", "term")
    val p = plan(LexIndex.scorePanel(post, stats, qt,
      Seq("join", "query", "spark")))
    assert(!contains(p, "documents.parquet"),
      s"panel scoring must not rescan the corpus:\n$p")
    val posts = scansOf(p, "_lpost")
    assert(posts.nonEmpty, s"expected stored posting scan:\n$p")
    assert(posts.exists(_.metadata("PushedFilters").contains("In(term")),
      s"the panel term universe must push into the posting scan:\n$p")
    assert(posts.exists(_.metadata("PushedFilters")
        .contains("LessThanOrEqual(df")),
      s"df <= cap must push into the posting scan:\n$p")
    posts.foreach { s =>
      val sel = s.optionalBucketSet
      assert(sel.isDefined && sel.get.cardinality() < s.relation
        .bucketSpec.get.numBuckets,
        s"posting scan must bucket-prune to the panel terms:\n$p")
    }
    // the (query_id, term) attribution join broadcasts the tiny panel
    assert(p.exists {
      case _: BroadcastHashJoinExec => true
      case _ => false
    }, s"queryTerms attribution must be a broadcast join:\n$p")
  }

  test("q_embedding_drift: the corpus feeds ONE aggregation; the LxL " +
    "comparison joins only post-agg centroid rows") {
    val p = plan(Registry.queryMap("q_embedding_drift")(spark, dir))
    // the only nested-loop join is the label-matrix comparison, and
    // every join input must contain an aggregate between itself and
    // any embeddings scan — the corpus is never joined raw
    val joins = p.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }
    assert(joins.nonEmpty, s"expected the LxL centroid join:\n$p")
    joins.foreach { j =>
      j.children.foreach { side =>
        if (scansOf(side, "embeddings.parquet").nonEmpty)
          assert(side.exists {
            case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
            case _ => false
          }, s"join side reads the corpus without aggregating first:\n$j")
      }
    }
  }
}
