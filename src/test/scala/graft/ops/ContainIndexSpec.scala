package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored containment index's lifecycle (sixth artifact family):
  * build (g1/doc_id-bucketed tables, df + over-cap counts precomputed),
  * probe (== an independently computed reference), daily append
  * (batch-local df lower bound — recall-safe), refresh (exact counts,
  * equal to a from-scratch rebuild).
  */
class ContainIndexSpec extends SparkSpec {
  import spark.implicits._

  // a 30-word "book", plus standing filler; probes include a verbatim
  // quote (containment 1.0) and an unrelated doc (no match)
  private val words = (1 to 30).map(i => s"w$i")
  private val book = words.mkString(" ")
  private val filler = "completely different standing content lives here okay fine"

  private def dropAll(tag: String): Unit =
    ContainIndex.tables(tag).foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))

  /** Pure-Scala reference: best standing match by containment (>= 0.8,
    * match asc tiebreak) for each probe doc, over word-3-gram sets —
    * candidate restriction mirrored (>=1 shared n-gram with standing
    * df <= cap).
    */
  private def reference(standing: Seq[(Long, String)],
                        probes: Seq[(Long, String)]): Map[Long, (Long, Double)] = {
    def ngrams(t: String): Set[String] = {
      val w = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val std = standing.map { case (id, t) => id -> ngrams(t) }
    val df = std.flatMap(_._2).groupBy(identity).map { case (g, l) => g -> l.size }
    probes.flatMap { case (pid, t) =>
      val png = ngrams(t)
      val best = std.flatMap { case (sid, sng) =>
        val shared = png & sng
        if (!shared.exists(g => df(g) <= DedupQueries.ContainDfCap)) None
        else {
          val cont = shared.size.toDouble / math.min(png.size, sng.size)
          if (cont >= DedupQueries.ContainTau) Some((sid, cont)) else None
        }
      }
      if (best.isEmpty) None
      else {
        val (sid, cont) = best.minBy { case (id, c) => (-c, id) }
        Some(pid -> ((sid, math.rint(cont * 1e6) / 1e6)))
      }
    }.toMap
  }

  test("probe against the stored index equals the pure-Scala reference: " +
    "the quote matches its book at containment 1.0, unrelated docs are " +
    "absent") {
    val tag = "graft_test_ci_probe"
    dropAll(tag)
    val standing = Seq((1L, book), (3L, filler)) ++
      (10L to 14L).map(i => (i, s"standing page $i " + words.take(6).mkString(" ")))
    val probes = Seq(
      (100L, words.slice(9, 17).mkString(" ")), // 8-word verbatim quote
      (101L, "zz yy xx ww vv uu tt"))           // unrelated
    val (post, arrs) = ContainIndex.buildOrLoad(spark,
      standing.toDF("doc_id", "text"), tag)
    val got = ContainIndex.probe(
      DedupQueries.ngramDocs(probes.toDF("doc_id", "text")), post, arrs)
      .select("doc_id", "match_id", "containment")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == reference(standing, probes), s"got $got")
    assert(got(100L) == ((1L, 1.0)))
    assert(!got.contains(101L))
    dropAll(tag)
  }

  test("df and oc are precomputed stored columns and correct") {
    val tag = "graft_test_ci_cols"
    dropAll(tag)
    // 20 copies of one boilerplate doc push its n-grams over the cap
    val boiler = "all rights reserved by the original publisher entity"
    val standing = Seq((1L, book)) ++ (50L to 69L).map(i => (i, boiler))
    val (post, arrs) = ContainIndex.buildOrLoad(spark,
      standing.toDF("doc_id", "text"), tag)
    // boilerplate n-grams: df 20 (> cap); book n-grams: df 1
    val dfs = post.select("g1", "df").distinct()
      .as[(String, Long)].collect().toMap
    assert(dfs.values.toSet == Set(1L, 20L))
    // every boilerplate doc's oc = its full n-gram count; book oc = 0
    val ocs = arrs.select("doc_id", "na", "oc")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ocs(1L)._2 == 0L)
    (50L to 69L).foreach(i => assert(ocs(i)._2 == ocs(i)._1.toLong, s"doc $i"))
    dropAll(tag)
  }

  test("randomized corpora: stored-index probe equals the pure-Scala " +
    "reference (build + probe + best-match under low-entropy text)") {
    val rnd = new scala.util.Random(4321)
    val vocab = (1 to 10).map(i => s"u$i")
    for (trial <- 1 to 2) {
      val tag = s"graft_test_ci_rnd$trial"
      dropAll(tag)
      val standing = (1L to 20L).map { id =>
        val len = 4 + rnd.nextInt(10)
        (id, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // probes: slices of standing docs (true containment) + fresh noise
      val probes = (100L to 104L).map { id =>
        if (id % 2 == 0) {
          val (_, src) = standing(rnd.nextInt(standing.size))
          val w = src.split(" ")
          val n = math.max(3, w.length - rnd.nextInt(2))
          (id, w.take(n).mkString(" "))
        } else
          (id, Seq.fill(5)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val (post, arrs) = ContainIndex.buildOrLoad(spark,
        standing.toDF("doc_id", "text"), tag)
      val got = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")), post, arrs)
        .select("doc_id", "match_id", "containment")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == reference(standing, probes),
        s"trial $trial: probe != reference\ngot $got\nref ${reference(standing, probes)}")
      dropAll(tag)
    }
  }

  test("append then refreshCounts equals a from-scratch rebuild; " +
    "pre-refresh batch-local df is a lower bound (recall-safe)") {
    val tagA = "graft_test_ci_append"
    val tagB = "graft_test_ci_rebuild"
    dropAll(tagA); dropAll(tagB)
    val first = Seq((1L, book), (2L, filler))
    val second = Seq((3L, book + " extra tail"), (4L, "more standing text arrives"))
    ContainIndex.buildOrLoad(spark, first.toDF("doc_id", "text"), tagA)
    ContainIndex.append(spark, second.toDF("doc_id", "text"), tagA)
    // pre-refresh: appended book n-grams carry df=1 (batch-local),
    // standing copies carry df=1 — both lower bounds of the true 2
    val preDf = spark.table(s"${tagA}_cngrams")
      .groupBy("g1").agg(max("df").as("m")).select("m").as[Long].collect()
    assert(preDf.forall(_ <= 2L))
    ContainIndex.refreshCounts(spark, tagA)
    ContainIndex.buildOrLoad(spark,
      (first ++ second).toDF("doc_id", "text"), tagB)
    def canon(t: String) = spark.table(t)
      .select(col("g1"), col("doc_id"), col("na"), col("df"))
      .orderBy("g1", "doc_id").collect().toSeq
    assert(canon(s"${tagA}_cngrams") == canon(s"${tagB}_cngrams"))
    def canonD(t: String) = spark.table(t)
      .select(col("doc_id"), col("na"), col("oc"))
      .orderBy("doc_id").collect().toSeq
    assert(canonD(s"${tagA}_cdocs") == canonD(s"${tagB}_cdocs"))
    dropAll(tagA); dropAll(tagB)
  }

  test("delete (r15 verdict #1, the append dual): a deleted doc is " +
    "never matched again on the probe face — immediately, pre-refresh " +
    "— and delete + refreshCounts == a from-scratch rebuild over the " +
    "survivors on both tables AND on probe results") {
    val tagA = "graft_test_ci_del"
    val tagB = "graft_test_ci_del_ref"
    dropAll(tagA); dropAll(tagB)
    // two copies of the book (1, 3) + filler (2); delete copy 1
    val standing = Seq((1L, book), (2L, filler), (3L, book + " extra tail"))
    ContainIndex.buildOrLoad(spark, standing.toDF("doc_id", "text"), tagA)
    val (ngR, dcR) = ContainIndex.delete(spark,
      Seq(1L, 99L).toDF("doc_id"), tagA)
    assert(ngR == 28L && dcR == 1L, s"got ($ngR, $dcR)") // 30 words -> 28 3-grams
    // the takedown guarantee pre-refresh: a probing quote of the book
    // matches the SURVIVING copy, never doc 1
    val probes = Seq((50L, words.take(10).mkString(" ")))
    val got = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")),
        spark.table(s"${tagA}_cngrams"), spark.table(s"${tagA}_cdocs"))
      .select("doc_id", "match_id").as[(Long, Long)].collect().toMap
    assert(got == Map(50L -> 3L), s"probe must see only the survivor: $got")
    // re-level, then: tables == rebuild over survivors, and the probe
    // face equals the rebuild's probe row for row
    ContainIndex.refreshCounts(spark, tagA)
    val survivors = standing.filterNot(_._1 == 1L)
    ContainIndex.buildOrLoad(spark, survivors.toDF("doc_id", "text"), tagB)
    def canon(t: String) = spark.table(t)
      .select(col("g1"), col("doc_id"), col("na"), col("df"))
      .orderBy("g1", "doc_id").collect().toSeq
    assert(canon(s"${tagA}_cngrams") == canon(s"${tagB}_cngrams"))
    def canonD(t: String) = spark.table(t)
      .select(col("doc_id"), col("na"), col("oc"))
      .orderBy("doc_id").collect().toSeq
    assert(canonD(s"${tagA}_cdocs") == canonD(s"${tagB}_cdocs"))
    val pa = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")),
        spark.table(s"${tagA}_cngrams"), spark.table(s"${tagA}_cdocs"))
      .collect().toSeq
    val pb = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")),
        spark.table(s"${tagB}_cngrams"), spark.table(s"${tagB}_cdocs"))
      .collect().toSeq
    assert(pa == pb, "probe == rebuild's probe after re-level")
    // idempotent
    assert(ContainIndex.delete(spark, Seq(1L).toDF("doc_id"), tagA) ==
      ((0L, 0L)))
    dropAll(tagA); dropAll(tagB)
  }

  test("refreshCountsPartial (r16 verdict #4): only partitions holding " +
    "touched n-grams / changed docs rewrite — result == the full " +
    "refreshCounts on BOTH tables row-for-row, untouched partitions' " +
    "files byte-identical, ledger reset, second pass a no-op") {
    val tagP = "graft_test_ci_partial"
    val tagF = "graft_test_ci_partfull"
    dropAll(tagP); dropAll(tagF)
    // standing corpus with a boilerplate class already OVER the cap
    // (df 20 > ContainDfCap) plus unique docs; the append is a SMALL
    // batch (2 n-grams — the daily-delta shape the ledger exists for)
    // sharing one n-gram with the book, so that n-gram's stored df
    // goes stale (batch-local 1, true 2) in 1-2 pb partitions while
    // the rest stay untouched
    val boiler = "all rights reserved by the original publisher entity"
    val standing = Seq((1L, book), (2L, filler)) ++
      (50L to 69L).map(i => (i, boiler))
    val batch = Seq((100L, "w1 w2 w3 freshtail"))
    for (t <- Seq(tagP, tagF)) {
      ContainIndex.buildOrLoad(spark, standing.toDF("doc_id", "text"), t)
      ContainIndex.append(spark, batch.toDF("doc_id", "text"), t)
    }
    // fixture sanity: the ledger must leave untouched partitions
    val nb = ContainIndex.buckets(spark, tagP)
    val touchedPbs = spark.table(s"${tagP}_ctouched")
      .select(expr(s"pmod(hash(g1), $nb)").cast("int")).distinct()
      .as[Int].collect().toSet
    val allPbs = spark.table(s"${tagP}_cngrams")
      .select(col("pb").cast("int")).distinct().as[Int].collect().toSet
    assert(touchedPbs.nonEmpty && (allPbs -- touchedPbs).nonEmpty,
      s"fixture must leave untouched pb partitions: $touchedPbs of $allPbs")
    def files(table: String, part: String, ks: Set[Int]): Map[String, (Long, Long)] =
      ks.flatMap { k =>
        val d = new java.io.File(s"spark-warehouse/$table/$part=$k")
        Option(d.listFiles()).toSeq.flatten
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> (f.length(), f.lastModified()))
      }.toMap
    val beforeNg = files(s"${tagP}_cngrams", "pb", allPbs -- touchedPbs)
    assert(beforeNg.nonEmpty, "untouched pb partitions must have files")
    val allPds = spark.table(s"${tagP}_cdocs")
      .select(col("pd").cast("int")).distinct().as[Int].collect().toSet
    val beforeDc = files(s"${tagP}_cdocs", "pd", allPds)
    val (nPb, nPd) = ContainIndex.refreshCountsPartial(spark, tagP)
    assert(nPb == touchedPbs.size.toLong)
    assert(files(s"${tagP}_cngrams", "pb", allPbs -- touchedPbs) == beforeNg,
      "untouched pb partitions must be byte-identical")
    // doc partitions NOT holding a changed-oc doc are byte-identical too
    val rewrittenPds = allPds.filter(k =>
      files(s"${tagP}_cdocs", "pd", Set(k)) !=
        beforeDc.filter(_._1.contains(s"pd=$k/")))
    assert(rewrittenPds.size.toLong == nPd,
      s"rewritten pd partitions ($rewrittenPds) must match the return ($nPd)")
    // the reference: a FULL re-level on the twin
    ContainIndex.refreshCounts(spark, tagF)
    def canonNg(t: String) = spark.table(t)
      .select("g1", "doc_id", "na", "df")
      .as[(String, Long, Int, Long)].collect().toSet
    def canonDc(t: String) = spark.table(t)
      .select("doc_id", "na", "oc")
      .as[(Long, Int, Long)].collect().toSet
    assert(canonNg(s"${tagP}_cngrams") == canonNg(s"${tagF}_cngrams"),
      "partial == full on the posting table")
    assert(canonDc(s"${tagP}_cdocs") == canonDc(s"${tagF}_cdocs"),
      "partial == full on the doc table")
    // ledger reset; a second partial pass is a no-op
    assert(spark.table(s"${tagP}_ctouched").count() == 0)
    assert(ContainIndex.refreshCountsPartial(spark, tagP) == ((0L, 0L)))
    // the probe face reads the re-leveled index correctly (the pruned
    // dynamic overwrite must not mis-bucket its files)
    val probes = Seq((200L, words.take(10).mkString(" ")))
    val pa = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")),
        spark.table(s"${tagP}_cngrams"), spark.table(s"${tagP}_cdocs"))
      .collect().toSeq
    val pf = ContainIndex.probe(
        DedupQueries.ngramDocs(probes.toDF("doc_id", "text")),
        spark.table(s"${tagF}_cngrams"), spark.table(s"${tagF}_cdocs"))
      .collect().toSeq
    assert(pa == pf && pa.nonEmpty, "probe over partial == probe over full")
    dropAll(tagP); dropAll(tagF)
  }

  test("delete then refreshCountsPartial == a from-scratch rebuild " +
    "over the survivors (both tables), and oc re-levels when the " +
    "delete moves an n-gram back UNDER the cap") {
    val tagA = "graft_test_ci_delpart"
    val tagB = "graft_test_ci_delpart_ref"
    dropAll(tagA); dropAll(tagB)
    // 20 boilerplate copies put its n-grams over the cap (oc > 0 for
    // those docs); deleting 15 copies brings df back under the cap, so
    // survivors' oc must re-level to 0 — the crossing case the pruned
    // oc audit exists for
    val boiler = "all rights reserved by the original publisher entity"
    val standing = Seq((1L, book), (2L, filler)) ++
      (50L to 69L).map(i => (i, boiler))
    ContainIndex.buildOrLoad(spark, standing.toDF("doc_id", "text"), tagA)
    assert(spark.table(s"${tagA}_cdocs")
      .filter(col("doc_id") === 50L).select("oc").as[Long].head() > 0L)
    val removedIds = (55L to 69L)
    val (ngR, dcR) = ContainIndex.delete(spark,
      removedIds.toDF("doc_id"), tagA)
    assert(ngR > 0L && dcR == removedIds.size.toLong)
    val (nPb, nPd) = ContainIndex.refreshCountsPartial(spark, tagA)
    assert(nPb > 0L && nPd > 0L,
      s"the cap crossing must force an oc rewrite: ($nPb, $nPd)")
    val survivors = standing.filterNot(d => removedIds.contains(d._1))
    ContainIndex.buildOrLoad(spark, survivors.toDF("doc_id", "text"), tagB)
    def canonNg(t: String) = spark.table(t)
      .select("g1", "doc_id", "na", "df")
      .as[(String, Long, Int, Long)].collect().toSet
    def canonDc(t: String) = spark.table(t)
      .select("doc_id", "na", "oc")
      .as[(Long, Int, Long)].collect().toSet
    assert(canonNg(s"${tagA}_cngrams") == canonNg(s"${tagB}_cngrams"))
    assert(canonDc(s"${tagA}_cdocs") == canonDc(s"${tagB}_cdocs"))
    // surviving boilerplate docs' oc re-leveled to 0 (df 5 <= cap)
    assert(spark.table(s"${tagA}_cdocs")
      .filter(col("doc_id") === 50L).select("oc").as[Long].head() == 0L)
    dropAll(tagA); dropAll(tagB)
  }
}
