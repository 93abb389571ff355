package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels a diameter-5 chain and a separate pair") {
    // chain 1-2-3-4-5-6 (diameter 5) + isolated pair 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L)).toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 6)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents is direction-agnostic (edges symmetrized)") {
    // min id at the SINK of every edge: propagation must flow both ways
    val edges = Seq((5L, 1L), (6L, 5L), (7L, 6L)).toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("connectedComponents with too few iterations under-merges (contract)") {
    // documents the iters-vs-diameter contract: a 6-chain needs >= 5 hops
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val got = DedupQueries.connectedComponents(edges, 2)
      .as[(Long, Long)].collect().toMap
    assert(got(6L) == 4L) // only reached 2 hops back, not the global min
  }

  /** Reference union-find over an edge list (min id as representative). */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def checkStar(edges: Seq[(Long, Long)]): Unit = {
    val got = DedupQueries
      .connectedComponentsStar(edges.toDF("src", "dst"), maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == ufComponents(edges), s"star CC != union-find on $edges")
  }

  test("star-contraction CC equals union-find on an adversarial 64-chain") {
    // diameter 63: min-label propagation would need 63 rounds; star
    // contraction converges in O(log d) — this is its reason to exist
    checkStar((0L until 63L).map(i => (i, i + 1)))
  }

  test("star-contraction CC equals union-find on cliques, stars and a random graph") {
    val clique = for { i <- 100L to 105L; j <- (i + 1) to 105L } yield (i, j)
    val starUp = (1L to 9L).map(i => (0L, i)) // hub is the min
    val starDown = (10L to 19L).map(i => (i, 20L)) // hub is the max
    checkStar(clique ++ starUp ++ starDown)
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    checkStar(random)
  }

  test("q_dedup_recall emits 1.0/1.0 (not NULL) on a corpus with no " +
    "near-dups — the falsifiability metric never silently voids") {
    // All docs disjoint -> zero LSH candidates AND zero true pairs:
    // both ratio denominators are 0. The vacuous-truth guards must emit
    // explicit 1.0s, not NULLs.
    val d = java.nio.file.Files.createTempDirectory("recallguard").toString
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src1"),
      (2L, "one two three four five six seven eight nine ten", "en", "src1"),
      (3L, "red orange yellow green blue indigo violet pink brown black", "en", "src2"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val row = graft.Registry.queryMap("q_dedup_recall")(spark, d).collect()(0)
    assert(row.getAs[Long]("n_candidates") == 0L &&
      row.getAs[Long]("n_true_pairs") == 0L,
      s"corpus unexpectedly produced pairs: $row")
    assert(row.getAs[Double]("precision") == 1.0 &&
      row.getAs[Double]("recall") == 1.0, s"guards must fire: $row")
  }

  test("q_dedup_semantic invariants: keeper is the cluster min, keepers " +
    "are never dups, every keeper row exists") {
    val rows = graft.Registry.queryMap("q_dedup_semantic")(
      spark, "/root/testdata/sf0.001")
      .select("vec_id", "keeper_id", "is_dup")
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r._1 -> r).toMap
    rows.foreach { case (vec, keeper, isDup) =>
      assert(keeper <= vec, s"keeper must be the component min: $vec -> $keeper")
      assert((isDup == 1) == (keeper != vec), s"is_dup inconsistent for $vec")
      // the representative a dup points to is itself kept, not a dup
      assert(byId(keeper)._3 == 0, s"keeper $keeper of $vec is itself a dup")
    }
  }

  test("logHotBucketAudit surfaces what the cap skips (synthetic hot bucket)") {
    import scala.jdk.CollectionConverters._
    val boiler = "this is the same boilerplate license header text " +
      "repeated verbatim across many documents in the corpus"
    val docs = ((1L to 6L).map(i => (i, boiler)) :+
      (100L, "one unique document with entirely different content here"))
      .toDF("doc_id", "text")
    val logFile = java.nio.file.Files.createTempFile("graft-hotbucket", ".log")
    val log = graft.etl.MigrationLog.toFile(logFile)
    // 6 identical docs -> identical shingle sets -> 3 (band, bh) buckets
    // of size 6, all over a cap of 4; the unique doc's buckets are size 1.
    val (nBuckets, nRows) = DedupQueries.logHotBucketAudit(docs, log, cap = 4)
    assert(nBuckets == 3 && nRows == 18, s"got ($nBuckets, $nRows)")
    val lines = java.nio.file.Files.readAllLines(logFile).asScala
    assert(lines.exists(l => l.contains("WARN") &&
      l.contains("skipped_buckets=3") && l.contains("skipped_rows=18")),
      s"expected a WARN audit line, got:\n${lines.mkString("\n")}")
    // an inert cap (nothing skipped) logs INFO, not WARN
    assert(DedupQueries.logHotBucketAudit(docs, log, cap = 100) == ((0L, 0L)))
    assert(lines.size < java.nio.file.Files.readAllLines(logFile).size)
  }

  test("declared cluster path labels a diameter-6 chain the fixed-4 propagation splits") {
    // The r5 latent hazard, made concrete: a chain of partial overlaps
    // 1-2-3-4-5-6-7 has diameter 6. The OLD declared path (fixed
    // CcIters=4 min-label propagation) under-merges it — node 7 only
    // reaches 4 hops back — while the NOW-declared clusterComponents
    // (star contraction to fixpoint) is exact. This test pins the
    // declared path to the exact variant: it FAILS if q_dedup_clusters
    // ever regresses to a fixed-round propagation.
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L)).toDF("src", "dst")
    val old = DedupQueries.connectedComponents(chain, DedupQueries.CcIters)
      .as[(Long, Long)].collect().toMap
    assert(old(7L) != 1L, "fixed-4 propagation unexpectedly converged; " +
      "the differential no longer demonstrates the hazard")
    val declared = DedupQueries.clusterComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(declared == (1L to 7L).map(_ -> 1L).toMap)
  }

  test("star-contraction CC matches min-label propagation on the shared edge shape") {
    val edges = Seq((5L, 1L), (6L, 5L), (7L, 6L), (30L, 31L))
    val prop = DedupQueries.connectedComponents(edges.toDF("src", "dst"), 6)
      .as[(Long, Long)].collect().toMap
    val star = DedupQueries
      .connectedComponentsStar(edges.toDF("src", "dst"), maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("q_simhash_recall: planted exact-duplicate pairs score 1.0/1.0 " +
    "(identical text -> identical fingerprint AND verified pair)") {
    val d = java.nio.file.Files.createTempDirectory("shrecall").toString
    def doc(seed: Int) = (1 to 24).map { j =>
      // md5-derived tokens: docs of different seeds share no substrings
      // beyond hex-chance, so cross-seed Jaccard sits far below the
      // verify threshold and fingerprints differ (deterministic pin)
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 10)
    }.mkString(" ")
    // 3 exact-dup pairs + 4 distinct singletons (distinct content ->
    // distinct 32-bit majorities on this corpus; deterministic, so the
    // expectation is a stable pin, not a statistical hope)
    val docs = (0 until 3).flatMap(p =>
      Seq((p * 2 + 1L, doc(p)), (p * 2 + 2L, doc(p)))) ++
      (10 until 14).map(i => (i.toLong, doc(i)))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    // BOTH variants: identical text -> identical fingerprint (equality
    // hit, hamming 0) and cross-seed docs differ in ~half their 64 bits
    // (deterministic corpus — far beyond the k=3 slack and no shared
    // 16-bit band), so each variant scores exactly the 3 planted pairs.
    val rows = graft.Registry.queryMap("q_simhash_recall")(spark, d)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 2, s"got ${rows.toSeq}")
    rows.foreach { r =>
      assert((r._2, r._3, r._4, r._5, r._6) == ((3L, 3L, 3L, 1.0, 1.0)),
        s"variant ${r._1}: got $r")
    }
  }

  test("q_simhash_recall: identities hold on real testdata (hits bounded " +
    "by both pair sets, ratios consistent) for BOTH variants") {
    val rows = graft.Registry.queryMap("q_simhash_recall")(
      spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("fp_equality", "hamming_k3"))
    rows.foreach { r =>
      assert(r._4 <= r._2 && r._4 <= r._3)
      assert(r._5 == math.round(r._4.toDouble / r._2 * 1e6) / 1e6)
      assert(r._6 == math.round(r._4.toDouble / r._3 * 1e6) / 1e6)
    }
  }

  test("q_dup_triangles: a 3-clique (triple-copied doc) + a mirror pair " +
    "count one triangle, three wedges, coefficient 1.0") {
    val d = java.nio.file.Files.createTempDirectory("dtri").toString
    def doc(seed: Int) = (1 to 24).map { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 10)
    }.mkString(" ")
    // 3 copies of doc(0) -> a 3-clique; 2 copies of doc(1) -> one edge
    val docs = Seq((1L, doc(0)), (2L, doc(0)), (3L, doc(0)),
      (10L, doc(1)), (11L, doc(1)), (20L, doc(2)))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val r = graft.Registry.queryMap("q_dup_triangles")(spark, d)
      .as[(Long, Long, Long, Long, Option[Double])].collect()(0)
    // edges 3+1, docs-with-edge 5, wedges 3x(2*1/2)=3, triangles 1,
    // coeff 3*1/3 = 1.0 (the clique regime)
    assert(r == ((4L, 5L, 3L, 1L, Some(1.0))), r)
  }

  test("q_minhash_est_error: planted exact duplicates land in the top " +
    "bin with zero error; identities hold on real testdata") {
    val d = java.nio.file.Files.createTempDirectory("mherr").toString
    def doc(seed: Int) = (1 to 24).map { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 10)
    }.mkString(" ")
    val docs = (0 until 3).flatMap(p =>
      Seq((p * 2 + 1L, doc(p)), (p * 2 + 2L, doc(p))))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val rows = graft.Registry.queryMap("q_minhash_est_error")(spark, d)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    // identical docs: J = 1 (bin 5), signature agreement 12/12 -> est 1
    assert(rows == Seq((5, 3L, 1.0, 1.0, 0.0, 0.0)), rows)
    // real-testdata identities: means bounded, |bias| <= mean abs err
    val real = graft.Registry.queryMap("q_minhash_est_error")(
      spark, "/root/testdata/sf0.001")
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r._3 >= 0.0 && r._3 <= 1.0 && r._4 >= 0.0 && r._4 <= 1.0)
      assert(math.abs(r._6) <= r._5 + 1e-9, r)
    }
  }

  test("q_dedup_simhash_hamming: planted single-bit flips are retrieved " +
    "with their exact Hamming distance; far docs are absent") {
    // Structural pin of the pigeonhole guarantee: a pair at Hamming
    // d <= 3 MUST surface (some band matches exactly). Identical docs
    // pin d = 0; distinct-seed docs pin absence.
    val d = java.nio.file.Files.createTempDirectory("shham").toString
    def doc(seed: Int) = (1 to 24).map { j =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 10)
    }.mkString(" ")
    val docs = Seq((1L, doc(0)), (2L, doc(0)), (3L, doc(1)), (4L, doc(2)))
    docs.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.Registry.queryMap("q_dedup_simhash_hamming")(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L)), s"got $got")
  }
}
