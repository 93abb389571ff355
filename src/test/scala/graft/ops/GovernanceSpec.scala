package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files
import org.apache.spark.sql.functions.col

/** Pre-epoch governance audits (GovernanceQueries): every claim in the
  * scaladocs is exercised here with PLANTED ground truth —
  *
  *  - Gopher rules fire on exactly the planted violator per rule and on
  *    nothing else (both directions: the clean doc trips zero rules);
  *  - the PII detector's recall/precision move with the planted truth
  *    (clean corpus -> 1.0/1.0 with exact counts; natural-PII corpus ->
  *    the false-positive arm counts exactly the natural matches and
  *    precision drops to the predicted value);
  *  - temperature scaling flattens in the right DIRECTION and by the
  *    analytically-computed amount on a controlled 90/10 corpus;
  *  - the curriculum stages are cumulative, end at the full corpus, and
  *    anneal mean quality downward;
  *  - the zone-map audit returns the layout verdict it exists to prove:
  *    insertion prunes nothing, single-key sort prunes only its own
  *    dimension, Z-order prunes both — and pruning is SOUND (scanned
  *    rows >= matching rows on every row of the table).
  */
class GovernanceSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ gopher

  /** One doc per rule violating ONLY that rule, plus one clean doc.
    * Bounds under test: nt in [20,80], mean word len in [3,10] (cross
    * multiplied), >= 2 stopword tokens, distinct/total >= 2/5.
    */
  private lazy val gopherDir: String = {
    val d = Files.createTempDirectory("govgopher").toString
    val w5 = (1 to 28).map(i => f"duck$i%03d") // 7-char distinct words
    val clean = ("the and " + w5.mkString(" ")) // nt=30 sl=202 nd=30 ns=2
    val tooShort = "the and " + w5.take(13).mkString(" ") // nt=15
    val tooLong = "the and " + (1 to 88).map(i => f"gull$i%03d").mkString(" ")
    val longWords = "the and " + (1 to 28)
      .map(i => f"pelicanpelican$i%03d").mkString(" ") // sl 3+3+28*17=482>300
    val noStop = (1 to 30).map(i => f"heron$i%03d").mkString(" ") // ns=0
    val dupSpam = Seq.fill(15)("the and").mkString(" ") // nt=30 nd=2
    Seq((1L, clean), (2L, tooShort), (3L, tooLong), (4L, longWords),
      (5L, noStop), (6L, dupSpam))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("gopher rules: each planted violator trips exactly its rule; the " +
    "clean doc trips none") {
    val rows = Registry.queryMap("q_gopher_rules")(spark, gopherDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows.size == 6)
    for (r <- Seq("1_word_count_low", "2_word_count_high", "3_mean_word_len",
        "4_stopword_min2", "5_dup_token_ratio")) {
      assert(rows(r)._2 == 1L, s"rule $r should fire exactly once")
    }
    // any-rule == 5 (violators are disjoint) => the clean doc fired nothing
    assert(rows("6_any_rule")._2 == 5L)
    assert(rows("6_any_rule")._3 == math.round(5.0 / 6 * 1e6) / 1e6)
  }

  test("gopher rules: an all-clean corpus reports zero violations") {
    val d = Files.createTempDirectory("govclean").toString
    val clean = "the and " + (1 to 28).map(i => f"duck$i%03d").mkString(" ")
    (1L to 4L).map(i => (i, clean)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_gopher_rules")(spark, d)
      .as[(String, Long, Double)].collect()
    assert(rows.length == 6 && rows.forall(_._2 == 0L))
  }

  // --------------------------------------------------------------- pii

  test("pii recall: clean corpus -> exact planted counts, recall and " +
    "precision both 1.0") {
    val d = Files.createTempDirectory("govpii").toString
    (1L to 70L).map(i => (i, s"doc number $i has only words"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val r = Registry.queryMap("q_pii_recall")(spark, d)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()(0)
    val planted = (1L to 70L).map(i =>
      (if (i % 5 == 0) 1L else 0L) + (if (i % 7 == 0) 1L else 0L)).sum
    assert(r._1 == 70L && r._2 == planted)   // n_docs, n_planted (=24)
    assert(r._3 == planted && r._4 == 0L)    // n_detected, n_false_pos
    assert(r._6 == 1.0 && r._7 == 1.0)       // recall, precision
  }

  test("pii recall: natural PII moves the false-positive arm and " +
    "precision by exactly the planted amount") {
    val d = Files.createTempDirectory("govpiinat").toString
    (1L to 70L).map { i =>
      val nat = if (i % 3 == 0) " reach bob@corp.net today" else ""
      (i, s"doc number $i has only words$nat")
    }.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val r = Registry.queryMap("q_pii_recall")(spark, d)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()(0)
    val planted = (1L to 70L).map(i =>
      (if (i % 5 == 0) 1L else 0L) + (if (i % 7 == 0) 1L else 0L)).sum
    val natural = (1L to 70L).count(_ % 3 == 0).toLong
    assert(r._3 == planted + natural && r._4 == natural)
    assert(r._5 == planted)            // n_true: detector still finds all
    assert(r._6 == 1.0)                // recall unharmed
    val expPrec = math.round(planted.toDouble / (planted + natural) * 1e6) / 1e6
    assert(r._7 == expPrec, s"precision ${r._7} != $expPrec")
  }

  // ------------------------------------------------------- temperature

  test("mixture temperature: flattening direction and magnitude on a " +
    "90/10 corpus") {
    val d = Files.createTempDirectory("govtemp").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ((1L to 90L).map(i => (i, text, "en")) ++
      (91L to 100L).map(i => (i, text, "zh")))
      .toDF("doc_id", "text", "lang").write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_mixture_temperature")(spark, d)
      .as[(Double, String, Long, Double, Double, Double)].collect()
    assert(rows.length == 4) // 2 alphas x 2 langs
    val q = rows.map(r => (r._1, r._2) -> r._5).toMap
    val rf = rows.map(r => (r._1, r._2) -> r._6).toMap
    // every alpha's shares sum to ~1 (6dp rounding on each share)
    for (a <- GovernanceQueries.Alphas)
      assert(math.abs(q((a, "en")) + q((a, "zh")) - 1.0) < 1e-5)
    // direction: lower alpha flattens harder; q_zh always above p_zh=0.1
    assert(q((0.3, "zh")) > q((0.7, "zh")) && q((0.7, "zh")) > 0.1)
    assert(rf((0.3, "zh")) > rf((0.7, "zh")) && rf((0.7, "zh")) > 1.0)
    assert(rf((0.3, "en")) < rf((0.7, "en")) && rf((0.7, "en")) < 1.0)
    // magnitude: q = p^a / sum(p^a) at p=(0.9,0.1), 6dp
    for (a <- GovernanceQueries.Alphas; (l, p) <- Seq("en" -> 0.9, "zh" -> 0.1)) {
      val exp = math.pow(p, a) / (math.pow(0.9, a) + math.pow(0.1, a))
      assert(math.abs(q((a, l)) - exp) < 1e-5, s"q($a,$l)")
    }
  }

  // -------------------------------------------------------- curriculum

  test("curriculum: stages are cumulative, end at the full corpus, and " +
    "anneal mean quality downward") {
    val d = Files.createTempDirectory("govcurr").toString
    val qp3 = "the " + (1 to 11).map(i => f"desert$i%02d").mkString(" ")
    val qp2 = "the " + (1 to 9).map(i => f"x$i").mkString(" ")
    val qp1 = "the end"
    val qp0 = "zz yy"
    val docs = (1L to 4L).map((_, qp3)) ++ (5L to 7L).map((_, qp2)) ++
      (8L to 9L).map((_, qp1)) :+ (10L, qp0)
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_curriculum")(spark, d)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_._3).toSeq == Seq(4L, 7L, 9L, 10L)) // cumulative docs
    val last = rows.last
    assert(last._5 == 1.0) // final stage == full corpus token share
    // monotone: docs/tokens nondecreasing, mean quality strictly annealing
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    assert(rows.map(_._6).sliding(2).forall(p => p(0) > p(1)))
    // stage-1 mean is the pure qp=3 slice
    assert(rows.head._6 == 3.0)
  }

  // ----------------------------------------------------------- zonemap

  test("zonemap audit: insertion prunes nothing, date-sort prunes only " +
    "dates, z-order prunes both; pruning is sound") {
    val d = Files.createTempDirectory("govzone").toString
    val base = java.time.LocalDate.of(1995, 1, 1)
    // 2048 orders; date and custkey decorrelated from key and each other
    (0L until 2048L).map { i =>
      (i, java.sql.Date.valueOf(base.plusDays((i * 997) % 1461)),
        (i * 613) % 1500)
    }.toDF("o_orderkey", "o_orderdate", "o_custkey")
      .write.parquet(s"$d/orders.parquet")
    val rows = Registry.queryMap("q_zonemap_prune")(spark, d)
      .as[(String, String, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()
    assert(rows.length == 9)
    val m = rows.map(r => (r._1, r._2) -> r).toMap
    // soundness everywhere: a pruned scan never reads fewer rows than match
    rows.foreach(r => assert(r._6 >= r._7, s"${r._1}/${r._2} unsound"))
    for (p <- Seq("1_date", "2_cust", "3_both")) {
      val ins = m((p, "0_insert"))
      assert(ins._4 == ins._3 && ins._8 == 1.0, s"insertion should not prune $p")
    }
    val ds = m(("1_date", "1_datesort"))
    assert(ds._4 < ds._3, "date-sort must prune the date predicate")
    assert(m(("2_cust", "1_datesort"))._4 == 16L,
      "date-sort cannot prune the custkey band")
    for (p <- Seq("1_date", "2_cust", "3_both")) {
      val z = m((p, "2_zorder"))
      assert(z._4 < z._3, s"z-order must prune $p")
    }
    assert(m(("3_both", "2_zorder"))._4 < m(("3_both", "1_datesort"))._4,
      "on the conjunction z-order must beat single-key sort")
  }

  // ----------------------------------------------------------- agreement

  test("filter agreement: structural subsumption (rules-pass implies " +
    "quality-pass), perfect-agreement corpus scores kappa 1, a " +
    "disagreeing corpus scores the closed form") {
    // gopherDir mixes both-drop docs (tooShort/dupSpam/noStop are also
    // quality-drops) with rules-only drops — n_only_quality must be 0
    val g = Registry.queryMap("q_filter_agreement")(spark, gopherDir)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()(0)
    assert(g._6 == 0L, "gopher-pass must imply quality-pass")
    assert(g._1 == 6L && g._2 == 5L)
    // perfect agreement: every doc either passes both or fails both
    val d = Files.createTempDirectory("govagree").toString
    val passBoth = "the and " + (1 to 28).map(i => f"duck$i%03d").mkString(" ")
    val failBoth = "zz yy"
    ((1L to 3L).map((_, passBoth)) ++ (4L to 6L).map((_, failBoth)))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val p = Registry.queryMap("q_filter_agreement")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()(0)
    assert(p._4 == 3L && p._7 == 3L && p._8 == 1.0 && p._9.contains(1.0))
    // disagreement: 2 both-drop, 1 rules-only drop, 3 both-pass
    val d2 = Files.createTempDirectory("govagree2").toString
    val rulesOnly = "the and " + (1 to 88).map(i => f"gull$i%03d").mkString(" ")
    ((1L to 3L).map((_, passBoth)) ++ (4L to 5L).map((_, failBoth)) :+
      (6L, rulesOnly))
      .toDF("doc_id", "text").write.parquet(s"$d2/documents.parquet")
    val q = Registry.queryMap("q_filter_agreement")(spark, d2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()(0)
    // n=6, a1=3 (rule drops), b1=2, both=2, onlyRules=1, neither=3
    assert((q._2, q._3, q._4, q._5, q._6, q._7) == ((3L, 2L, 2L, 1L, 0L, 3L)))
    val po = 5.0 / 6
    val pe = (3.0 * 2 + 3.0 * 4) / 36
    val kap = math.round((po - pe) / (1 - pe) * 1e6) / 1e6
    assert(q._9.contains(kap), s"kappa ${q._9} != $kap")
  }

  test("filter agreement: kappa is NULL when chance agreement is total") {
    val d = Files.createTempDirectory("govagreenull").toString
    val failBoth = "zz yy"
    (1L to 4L).map((_, failBoth)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val r = Registry.queryMap("q_filter_agreement")(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Option[Double])]
      .collect()(0)
    assert(r._8 == 1.0 && r._9.isEmpty)
  }

  // ------------------------------------------------------------ manifest

  test("corpus manifest: order-invariant (a shuffled rewrite yields the " +
    "identical receipt), content- and id-sensitive") {
    val d1 = Files.createTempDirectory("govman1").toString
    val docs = (1L to 40L).map(i =>
      (i, s"doc $i body text", if (i % 2 == 0) "en" else "fr",
        s"src${i % 3}"))
    docs.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d1/documents.parquet")
    val m1 = Registry.queryMap("q_corpus_manifest")(spark, d1)
      .collect().map(_.toString).toSeq
    // same rows, reversed insert order, different partitioning
    val d2 = Files.createTempDirectory("govman2").toString
    spark.createDataFrame(docs.reverse)
      .toDF("doc_id", "text", "lang", "source").repartition(7)
      .write.parquet(s"$d2/documents.parquet")
    val m2 = Registry.queryMap("q_corpus_manifest")(spark, d2)
      .collect().map(_.toString).toSeq
    assert(m1 == m2, "manifest must not depend on row order or layout")
    // one flipped char moves the receipt of exactly that source + total
    val d3 = Files.createTempDirectory("govman3").toString
    docs.map(r => if (r._1 == 7L) r.copy(_2 = r._2 + "!") else r)
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d3/documents.parquet")
    val m3 = Registry.queryMap("q_corpus_manifest")(spark, d3)
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    val m1m = Registry.queryMap("q_corpus_manifest")(spark, d1)
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(m3("src1")._6 != m1m("src1")._6) // doc 7 lives in src1
    assert(m3("src0")._6 == m1m("src0")._6 && m3("src2")._6 == m1m("src2")._6)
    assert(m3("*total*")._6 != m1m("*total*")._6)
    // id swap with identical text multiset also moves the receipt
    val d4 = Files.createTempDirectory("govman4").toString
    docs.map { r =>
      if (r._1 == 3L) r.copy(_1 = 9L)
      else if (r._1 == 9L) r.copy(_1 = 3L) else r
    }.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d4/documents.parquet")
    val m4 = Registry.queryMap("q_corpus_manifest")(spark, d4)
      .as[(String, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(m4("*total*")._6 != m1m("*total*")._6,
      "binding doc_id must make id swaps visible")
  }

  // ------------------------------------------------------ manifest merge

  test("manifest semilattice: merge of arbitrary snapshot partials == " +
    "the direct manifest, including cross-snapshot lang-set union") {
    // lang deliberately depends on doc_id so every snapshot sees a
    // DIFFERENT subset of a source's langs — the union must recover all
    val docs = (1L to 60L).map(i =>
      (i, s"doc $i body", s"L${i % 5}", s"src${i % 2}"))
      .toDF("doc_id", "text", "lang", "source")
    val direct = GovernanceQueries
      .manifestFinalize(GovernanceQueries.manifestPartial(docs))
      .collect().map(_.toString).toSeq
    for (k <- Seq(2, 3, 7)) { // uneven split arities, incl. one > #langs
      val parts = (0 until k).map(i =>
        GovernanceQueries.manifestPartial(
          docs.filter(col("doc_id") % k === i)))
      val merged = GovernanceQueries
        .manifestFinalize(GovernanceQueries.manifestMerge(
          parts.reduce(_ unionAll _)))
        .collect().map(_.toString).toSeq
      assert(merged == direct, s"k=$k merge path diverged")
    }
  }

  // --------------------------------------------------------------- diff

  test("corpusDiff: planted add/remove/change counted exactly; " +
    "self-diff is all-unchanged") {
    val v1 = Seq((1L, "alpha text", "sA"), (2L, "beta text", "sA"),
      (3L, "gamma text", "sB"), (4L, "delta text", "sB"),
      (5L, "epsilon text", "sB"), (6L, "zeta text", "sB"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq((1L, "alpha text", "sA"), // unchanged
      (3L, "gamma text EDITED", "sB"), // changed
      (4L, "delta text", "sB"), (5L, "epsilon text", "sB"),
      (6L, "zeta text", "sB"), // unchanged x3; doc 2 removed
      (99L, "new doc", "sA")) // added
      .toDF("doc_id", "text", "source")
    val got = GovernanceQueries.corpusDiff(v1, v2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("sA") == (("sA", 1L, 1L, 0L, 1L)))
    assert(got("sB") == (("sB", 0L, 0L, 1L, 3L)))
    assert(got("*total*") == (("*total*", 1L, 1L, 1L, 4L)))
    val self = GovernanceQueries.corpusDiff(v1, v1)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(self.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
    assert(self.find(_._1 == "*total*").get._5 == 6L)
  }

  // -------------------------------------------------- memorization curve

  test("memorization curve: a planted 16-token verbatim copy yields the " +
    "exact closed-form hit counts, decaying with n") {
    val d = Files.createTempDirectory("govmem").toString
    val evalDoc = (1 to 20).map(i => s"w$i").mkString(" ") // w1..w20
    val copyDoc = (1 to 16).map(i => s"w$i").mkString(" ") // verbatim prefix
    val cleanDoc = (1 to 20).map(i => s"z$i").mkString(" ") // disjoint
    Seq((1L, evalDoc, "src0"), (2L, copyDoc, "src1"), (3L, cleanDoc, "src2"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_memorization_curve")(spark, d)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // eval grams from a 20-token doc: 21-n of width n; the 16-token copy
    // contributes 17-n of them as hits
    assert(rows(4L) == ((4L, 17L, 13L, math.round(13.0 / 17 * 1e6) / 1e6)))
    assert(rows(8L) == ((8L, 13L, 9L, math.round(9.0 / 13 * 1e6) / 1e6)))
    assert(rows(16L) == ((16L, 5L, 1L, 0.2)))
    // decay: each width's hit fraction is below the previous
    assert(rows(4L)._4 > rows(8L)._4 && rows(8L)._4 > rows(16L)._4)
  }

  test("memorization curve: a leak-free split reports zero hits at " +
    "every width") {
    val d = Files.createTempDirectory("govmem0").toString
    Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "), "src0"),
      (2L, (1 to 20).map(i => s"z$i").mkString(" "), "src1"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val rows = Registry.queryMap("q_memorization_curve")(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 3 && rows.forall(r => r._3 == 0L && r._4 == 0.0))
  }

  // -------------------------------------------------- cluster-size hist

  test("cluster-size histogram ties to q_dedup_clusters and the corpus " +
    "total (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val hist = Registry.queryMap("q_cluster_size_hist")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    val nTotal = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(hist.map(_._3).sum == nTotal, "doc mass must cover the corpus")
    hist.foreach(r => assert(r._3 == r._1 * r._2, "n_docs = size * clusters"))
    // rows of size >= 2 must reproduce q_dedup_clusters' label relation
    val labeled = Registry.queryMap("q_dedup_clusters")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val bySize = labeled.groupBy(_._2).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    assert(hist.filter(_._1 >= 2).map(r => r._1 -> r._2).toMap == bySize)
    // singleton row = corpus minus labeled docs
    val single = hist.find(_._1 == 1L).get
    assert(single._2 == nTotal - labeled.length)
  }

  test("quality classifier: a lexically-separable corpus scores 1.0 " +
    "held-out (the scorer works when word identity carries the label)") {
    val d = java.nio.file.Files.createTempDirectory("gqc").toString
    // good docs: one shared 25-token rule-clean text (vocab gw*);
    // bad docs: one shared 3-token text (vocab zq*) failing the quality
    // gate AND the word-count rule. Even ids train, odd ids eval, both
    // classes in both splits; eval vocabulary fully seen in training.
    val goodText = (Seq("the", "and") ++
      (1 to 23).map(i => f"gw$i%02d")).mkString(" ")
    val docs = (1L to 8L).map((_, goodText)) ++
      (11L to 18L).map((_, "zq wq vq"))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val rows = graft.Registry.queryMap("q_quality_classifier")(spark, d)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows("*")._4 == 1.0, rows("*"))
    assert(rows("good")._4 == 1.0 && rows("bad")._4 == 1.0)
    // the baseline is strictly worse on the minority class: with
    // balanced classes the majority tie resolves to ONE label, so
    // beating baseline here proves the lexical signal was used
    assert(rows("*")._5 < 1.0)
  }

  // -------------------------------------------- takedown phase runner

  test("parPhase: a failing family verb fails the phase fast, after " +
    "ALL siblings completed (no detached work, no infinite hang)") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t0 = System.nanoTime()
      val e = intercept[RuntimeException] {
        GovernanceQueries.parPhase(spark, "parphase-test")(
          { Thread.sleep(300); slowDone.set(true); 1L })(
          { throw new RuntimeException("wedged family") })(
          2L)
      }
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(e.getMessage == "wedged family")
      // the barrier waited for the slow sibling's OUTCOME before
      // rethrowing: nothing is still running detached
      assert(slowDone.get(), "slow sibling must have completed")
      // ... and "bounded" means seconds, not PhaseTimeout
      assert(elapsedMs < GovernanceQueries.PhaseTimeout.toMillis / 2,
        s"phase took ${elapsedMs}ms")
    } finally pool.shutdown()
  }

  test("parPhase: the all-success path returns all three results and " +
    "leaves the overwrite-mode conf untouched") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val before = spark.conf.getOption(
        "spark.sql.sources.partitionOverwriteMode")
      val r = GovernanceQueries.parPhase(spark, "parphase-ok")(
        spark.range(10).count())("b")(3.5)
      assert(r == ((10L, "b", 3.5)))
      assert(spark.conf.getOption(
        "spark.sql.sources.partitionOverwriteMode") == before)
      // a verb that MUTATES the single-writer knob is caught by the
      // barrier assertion (and the conf restored for later tests)
      val e = intercept[IllegalArgumentException] {
        GovernanceQueries.parPhase(spark, "parphase-mut")(
          { spark.conf.set("spark.sql.sources.partitionOverwriteMode",
            "dynamic"); 1 })(2)(3)
      }
      assert(e.getMessage.contains("partitionOverwriteMode"))
      before match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset(
          "spark.sql.sources.partitionOverwriteMode")
      }
    } finally pool.shutdown()
  }
}
