package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image perceptual dedup (r10 verdict #2): extends the dedup family to
  * the MEDIA column — dHash (difference hash: 8x8 luminance-gradient
  * bits off a 9x8 grid) computed through the REAL pure-JDK codec path
  * ([[Multimodal.decodeImage]]'s `javax.imageio`), banded into 4x16-bit
  * Hamming-LSH bands, candidate pairs from the band equi-join, exact
  * Hamming verify — the MinHash/LSH skeleton of the text family applied
  * to pixels.
  *
  * CORPUS: the sandbox testdata carries no image column, so the corpus
  * is SYNTHESIZED deterministically from doc_id — each doc renders a
  * 9x8 8-bit grayscale PNG whose pixel (x,y) is an md5-derived
  * luminance of its GROUP id (doc_id % [[Groups]]; same group = same
  * base image), with docs at doc_id % [[PerturbMod]] == 0 getting ONE
  * pixel flipped (a planted NEAR-duplicate: a single pixel disturbs at
  * most two dHash bits, both in one band). What makes the query honest
  * despite the synthetic input: the PNG bytes really are encoded and
  * re-DECODED through ImageIO (PNG gray8 is lossless, so the decoded
  * raster equals the generating formula — asserted by ImageDedupSpec),
  * and the DuckDB oracle computes the same dHash analytically from the
  * formula, meeting the Spark result at the pixel contract. A real
  * deployment swaps the synthesis `mapPartitions` for the corpus's
  * binary column; every stage downstream of the raster is unchanged.
  *
  * Scale shape (100 TB): decode+hash is one narrow partition-parallel
  * pass (media decode is the one domain where `mapPartitions` is the
  * right tool — no Catalyst expression decodes PNG); everything after
  * is relational on 4 ints per image — the band self-join is an
  * equi-join on (band_idx, band_value) so work is linear in bucket
  * sizes, never corpus², and boilerplate buckets ARE capped exactly
  * like the text LSH ([[DedupQueries.HotBucketCap]], enforced r12 via
  * the stored `bsz` column — a pushed scan predicate, audited at
  * build); the signature relation is a stored artifact
  * ([[MediaSigStore]], the BandIndex pattern).
  */
object ImageDedup {

  /** dHash grid: 9 columns x 8 rows -> 8x8 = 64 gradient bits. */
  private val ImgW = 9
  private val ImgH = 8

  /** Image groups: doc_id % Groups share a base image (~5 docs/group at
    * the 500-doc scales — planted exact + near duplicates).
    */
  private val Groups = 97

  /** Every PerturbMod-th doc flips one pixel: a near-dup at Hamming <= 2
    * from its group's base (one pixel touches two adjacent comparisons
    * in its row — one band).
    */
  private val PerturbMod = 5

  /** Verify threshold: pairs at Hamming <= HamT are duplicates. Two
    * perturbed twins differ by <= 4 bits (two pixels, two bands), so
    * planted pairs sit well inside; random cross-group pairs sit at
    * ~32.
    */
  private[graft] val HamT = 6

  /** Exact-truth panel for q_image_recall (the q_dedup_recall bounded-
    * panel pattern): all-pairs ground truth on doc_id % 2 == 0.
    */
  private val PanelMod = 2

  /** Luminance contract shared by the Scala renderer and the DuckDB
    * oracle: first md5 byte of "g:x:y".
    */
  private[ops] def lum(g: Long, x: Int, y: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$g:$x:$y".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  /** The one flipped pixel of a perturbed doc, as a 0-based raster index
    * y*9+x (shared with the oracle's CASE).
    */
  private def perturbIdx(docId: Long): Long = (docId % ImgH) * ImgW + (docId % ImgW)

  /** Render doc `docId`'s 9x8 gray PNG (real ImageIO encode). */
  private[ops] def renderPng(docId: Long): Array[Byte] = {
    val g = docId % Groups
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        var v = lum(g, x, y)
        if (docId % PerturbMod == 0 && perturbIdx(docId) == y.toLong * ImgW + x)
          v = (v + 128) % 256
        r.setSample(x, y, 0, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** dHash bands from PNG bytes through the REAL decode path: ImageIO
    * read -> raster samples -> 64 gradient bits packed as 4x16-bit band
    * values (band k = rows 2k..2k+1; bit j of band k compares columns
    * j%8 and j%8+1 of row 2k + j/8). None when the bytes don't decode.
    */
  private[ops] def dhashBands(png: Array[Byte]): Option[(Int, Int, Int, Int)] =
    Multimodal.decodeImage(png).flatMap { case (w, h, _) =>
      if (w != ImgW || h != ImgH) None
      else {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        val l = Array.ofDim[Int](ImgH, ImgW)
        var y = 0
        while (y < ImgH) {
          var x = 0
          while (x < ImgW) { l(y)(x) = img.getRaster.getSample(x, y, 0); x += 1 }
          y += 1
        }
        def band(k: Int): Int = {
          var v = 0
          var j = 0
          while (j < 16) {
            val yy = 2 * k + j / 8
            val xx = j % 8
            if (l(yy)(xx + 1) > l(yy)(xx)) v |= 1 << j
            j += 1
          }
          v
        }
        Some((band(0), band(1), band(2), band(3)))
      }
    }

  private val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("b0", IntegerType, nullable = false),
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    StructField("b3", IntegerType, nullable = false)))

  /** (doc_id, b0..b3) dHash signatures for a doc relation: synthesize
    * PNG -> real decode -> bands, partition-parallel.
    */
  private[graft] def dhashSigs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sigSchema)
    docs.select(col("doc_id").cast(LongType))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          dhashBands(renderPng(id)).map { case (b0, b1, b2, b3) =>
            Row(id, b0, b1, b2, b3)
          }
        }
      }(enc)
  }

  /** The STORED signature artifact for a corpus dir ([[MediaSigStore]],
    * imgsig role): the decode+hash pass runs once per corpus snapshot;
    * queries read the bucketed 4-int rows scan-only — the BandIndex
    * convention applied to the media column (was a session cache until
    * r11).
    */
  private def stored(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    MediaSigStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      MediaSigStore.imageTag(dir), dhashSigs)

  /** Banded candidate pairs (id_a < id_b, distinct) + exact Hamming,
    * off the stored tables: the candidate self-join's one key (bk) is
    * the postings table's bucketing key, so both legs come off the
    * scan exchange-free; the verify fetches signatures from the
    * doc_id-bucketed table. Buckets over `cap` are SKIPPED via the
    * stored-bsz pushed predicate before the self-join — a degenerate
    * class (solid-color images, silent clips) otherwise expands into
    * O(class²) pairs at corpus scale (the text family's HotBucketCap,
    * enforced on the media joins as of r12; the build-time audit
    * reports what the cap skips). Inert at the shipped test scales
    * (max bucket ≈ group size ≪ cap) — the oracle carries the same
    * QUALIFY predicate so both engines compute one definition.
    */
  private[ops] def hammingPairs(sigs: DataFrame, bands: DataFrame,
                                cap: Int = DedupQueries.HotBucketCap
                               ): DataFrame = {
    val b = bands.filter(col("bsz") <= cap)
    val cand = b.as("a")
      .join(b.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (bitCnt(col("a0"), col("c0")) + bitCnt(col("a1"), col("c1")) +
          bitCnt(col("a2"), col("c2")) + bitCnt(col("a3"), col("c3")))
          .cast("long").as("hamming"))
  }

  private def bitCnt(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    bit_count(a.bitwiseXOR(b))

  /** Measured precision/recall of the banded candidate stage against
    * exact all-pairs Hamming truth on a bounded panel — the
    * q_dedup_recall pattern generalized over any 4×16-bit signature
    * artifact, shared by the image and audio recall queries (one
    * definition, one shape). Vacuous-truth guards as everywhere: no
    * candidates → precision 1.0, no true pairs → recall 1.0.
    */
  private[ops] def recallRow(sigs: DataFrame, bands: DataFrame,
                             panelMod: Int, hamT: Int): DataFrame = {
    val panel = sigs.filter(col("doc_id") % panelMod === 0)
    val truth = panel.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      .join(broadcast(panel.select(col("doc_id").as("id_b"),
        col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"),
        col("b3").as("c3"))), col("id_a") < col("id_b"))
      .filter((bitCnt(col("a0"), col("c0")) + bitCnt(col("a1"), col("c1")) +
        bitCnt(col("a2"), col("c2")) + bitCnt(col("a3"), col("c3")))
        <= hamT)
    val candP = hammingPairs(sigs, bands)
      .filter(col("id_a") % panelMod === 0 && col("id_b") % panelMod === 0)
    val m1 = panel.agg(count(lit(1)).as("n_panel_imgs"))
    val m2 = truth.agg(count(lit(1)).as("n_true_pairs"))
    val m3 = candP.agg(count(lit(1)).as("n_candidates"),
      sum(when(col("hamming") <= hamT, 1).otherwise(0))
        .cast("long").as("n_hits"))
    m1.crossJoin(m2).crossJoin(m3)
      .select(col("n_panel_imgs"), col("n_true_pairs"),
        col("n_candidates"), col("n_hits"),
        when(col("n_candidates") > 0,
          round(col("n_hits").cast("double") / col("n_candidates"), 6))
          .otherwise(1.0).as("precision"),
        when(col("n_true_pairs") > 0,
          round(col("n_hits").cast("double") / col("n_true_pairs"), 6))
          .otherwise(1.0).as("recall"))
  }

  /** The recall oracle's panel/truth/measure tail over a CTE chain
    * ending in `sig` + `ham` — shared text for the image and audio
    * recall twins.
    */
  private[ops] def recallSqlTail(panelMod: Int, hamT: Int): String =
    s"""panel AS (SELECT * FROM sig WHERE doc_id % $panelMod = 0),
       |truth AS (SELECT count(*) AS n_true_pairs
       |  FROM panel a JOIN panel b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
       |    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
       |    <= $hamT),
       |cp AS (SELECT * FROM ham
       |  WHERE id_a % $panelMod = 0 AND id_b % $panelMod = 0),
       |m AS (SELECT (SELECT count(*) FROM panel) AS n_panel_imgs,
       |    (SELECT n_true_pairs FROM truth) AS n_true_pairs,
       |    (SELECT count(*) FROM cp) AS n_candidates,
       |    (SELECT count(*) FILTER (hamming <= $hamT) FROM cp)
       |      AS n_hits)
       |SELECT n_panel_imgs, n_true_pairs, n_candidates, n_hits,
       |  CASE WHEN n_candidates > 0
       |    THEN round(CAST(n_hits AS DOUBLE)/n_candidates, 6)
       |    ELSE 1.0 END AS precision,
       |  CASE WHEN n_true_pairs > 0
       |    THEN round(CAST(n_hits AS DOUBLE)/n_true_pairs, 6)
       |    ELSE 1.0 END AS recall
       |FROM m""".stripMargin

  // ---------------------------------------------------------------- SQL
  // Oracle twins: the dHash computed ANALYTICALLY from the luminance
  // contract (PNG gray8 roundtrip is lossless, so formula == decoded
  // raster — the spec pins that equivalence on the Scala side).

  private val lumSqlCtes: String = {
    val hex = "'0123456789abcdef'"
    val key = s"g::VARCHAR||':'||(i%$ImgW)::VARCHAR||':'||(i//$ImgW)::VARCHAR"
    s"""imgs AS (SELECT doc_id, doc_id % $Groups AS g,
       |    doc_id % $PerturbMod = 0 AS pert FROM documents),
       |lum0 AS (SELECT doc_id, pert, list_transform(range(0, ${ImgW * ImgH}),
       |    i -> (strpos($hex, substr(md5($key),1,1))-1)*16
       |       + strpos($hex, substr(md5($key),2,1))-1) AS L0 FROM imgs),
       |lum AS (SELECT doc_id, list_transform(range(0, ${ImgW * ImgH}),
       |    i -> CASE WHEN pert AND i = (doc_id%$ImgH)*$ImgW + (doc_id%$ImgW)
       |      THEN (L0[i+1]+128)%256 ELSE L0[i+1] END) AS L FROM lum0)""".stripMargin
  }

  private def bandSql(k: Int): String =
    (0 until 16).map { j =>
      val y = 2 * k + j / 8
      val x = j % 8
      val i1 = y * ImgW + x + 1 // 1-based lum(x, y)
      s"(CASE WHEN L[${i1 + 1}] > L[$i1] THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  private val sigSqlCtes: String =
    s"""$lumSqlCtes,
       |sig AS (SELECT doc_id, ${bandSql(0)} AS b0, ${bandSql(1)} AS b1,
       |    ${bandSql(2)} AS b2, ${bandSql(3)} AS b3 FROM lum),
       |e AS (SELECT doc_id, unnest([b0,b1,b2,b3]) AS bv,
       |    unnest([0,1,2,3]) AS bi FROM sig),
       |ec AS (SELECT * FROM e QUALIFY count(*)
       |    OVER (PARTITION BY bi, bv) <= ${DedupQueries.HotBucketCap}),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ec a JOIN ec b ON a.bi = b.bi AND a.bv = b.bv
       |    AND a.doc_id < b.doc_id),
       |ham AS (SELECT id_a, id_b, CAST(bit_count(xor(sa.b0, sb.b0))
       |    + bit_count(xor(sa.b1, sb.b1)) + bit_count(xor(sa.b2, sb.b2))
       |    + bit_count(xor(sa.b3, sb.b3)) AS BIGINT) AS hamming
       |  FROM cand JOIN sig sa ON sa.doc_id = cand.id_a
       |    JOIN sig sb ON sb.doc_id = cand.id_b)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_dedup_image",
      "Image perceptual dedup: dHash (9x8 gray -> 64 gradient bits) " +
        "through the REAL javax.imageio encode+decode roundtrip, banded " +
        "4x16-bit Hamming LSH, band equi-join candidates, exact Hamming " +
        s"verify at <= $HamT. Corpus synthesized deterministically from " +
        "doc_id (no image column in the sandbox testdata): doc_id % " +
        s"$Groups groups share a base image, every ${PerturbMod}th doc " +
        "is a planted one-pixel near-dup. The oracle computes the same " +
        "dHash analytically — PNG gray8 losslessness (spec-pinned) is " +
        "what lets the codec path be oracle-checked at all.",
      (s, dir) => {
        val (sigs, bands) = stored(s, dir)
        hammingPairs(sigs, bands)
          .filter(col("hamming") <= HamT)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $sigSqlCtes
              |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $HamT
              |ORDER BY id_a, id_b""".stripMargin)
    ),

    QueryDef(
      "q_image_recall",
      "Measured precision/recall of the image dHash-band candidate " +
        "stage against exact all-pairs Hamming ground truth on a fixed " +
        s"panel (doc_id % $PanelMod == 0) — the falsifiability row for " +
        "the banding parameters (the q_dedup_recall pattern on the " +
        "media column). A planted one-pixel twin flips <= 2 bits in ONE " +
        "band, leaving >= 3 of 4 bands intact, so planted recall should " +
        "measure 1.0; random cross-group pairs sit at Hamming ~32 and " +
        "are rejected by the verify stage (precision's denominator).",
      (s, dir) => {
        val (sigs, bands) = stored(s, dir)
        recallRow(sigs, bands, PanelMod, HamT)
      },
      Some(s"""WITH $sigSqlCtes,
              |${recallSqlTail(PanelMod, HamT)}""".stripMargin)
    )
  )
}
