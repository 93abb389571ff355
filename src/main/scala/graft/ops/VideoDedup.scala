package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Video perceptual dedup — the FOURTH media column of the dedup matrix
  * (text → image r11 → audio r11 → video here), and the retirement of
  * the engine's last decode stub: signatures are computed through a
  * REAL pure-JDK AVI demux ([[Multimodal.decodeAvi]] walks the
  * RIFF/AVI container — hdrl headers, movi frame chunks — and
  * [[Multimodal.aviFrameGray8]] reconstructs each uncompressed-DIB
  * frame's raster losslessly). Per sampled frame: the dHash gradient
  * bits of [[ImageDedup]]; per video: band k = the XOR-fold of frame
  * k's four 16-bit dHash bands — so one flipped pixel in one frame
  * disturbs <= 2 bits of ONE band (XOR is linear; the two flipped
  * comparison bits keep their positions through the fold), >= 3 of 4
  * bands stay intact, and the banded-Hamming skeleton
  * ([[ImageDedup.hammingPairs]], [[MediaSigStore]] vidsig role,
  * hot-bucket cap included) works unchanged.
  *
  * CORPUS: synthesized deterministically from doc_id (the testdata has
  * no video column): each doc renders a [[FrameN]]-frame 9x8 grayscale
  * AVI whose frame f's pixel (x,y) is an md5-derived luminance of the
  * doc's GROUP (doc_id % [[Groups]]), encoded through the REAL
  * container writer ([[Multimodal.encodeAviGray8]] — canonical RIFF
  * layout, palette DIB, bottom-up 4-byte-aligned rows) and re-parsed
  * through the real demux. Every [[PerturbMod]]-th doc flips ONE pixel
  * of ONE frame (a planted near-duplicate). DIB-8 is lossless, so the
  * demuxed raster equals the generating formula (spec-pinned by
  * VideoDedupSpec) — which is what lets the DuckDB oracle compute the
  * same signature analytically. A real deployment swaps the synthesis
  * for the corpus's video column (MJPG frames decode through the
  * ImageIO path — [[Multimodal.aviFrameImage]], spec-exercised); every
  * stage downstream of the per-frame raster is unchanged.
  *
  * Scale shape: identical to the image/audio twins — demux+hash is one
  * narrow partition-parallel pass (frame sampling reads [[FrameN]]
  * frames per clip, constant work per item), everything after is
  * relational on 4 ints per video with the capped exchange-free band
  * join off the stored artifact.
  */
object VideoDedup {

  /** Sampled frames per video — one 16-bit folded band each. A real
    * deployment samples 4 of N frames at a fixed stride; the synthetic
    * corpus carries exactly the sampled set.
    */
  private val FrameN = 4

  private val ImgW = 9
  private val ImgH = 8

  /** Distinct from the image (97) and audio (89) moduli so the three
    * synthetic corpora don't shadow each other's group structure.
    */
  private val Groups = 101
  private val PerturbMod = 5
  private[graft] val HamT = 6
  private val PanelMod = 2

  /** Luminance contract shared by the renderer and the oracle: first
    * md5 byte of "g:f:x:y".
    */
  private[ops] def lum(g: Long, f: Int, x: Int, y: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$g:$f:$x:$y".getBytes(
      java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  /** The one flipped (frame, pixel) of a perturbed doc (shared with the
    * oracle's CASE): frame doc_id % FrameN, raster index
    * (doc_id % 8) * 9 + doc_id % 9.
    */
  private def perturbFrame(docId: Long): Int = (docId % FrameN).toInt
  private def perturbIdx(docId: Long): Long =
    (docId % ImgH) * ImgW + (docId % ImgW)

  /** Render doc `docId`'s 4-frame gray AVI through the REAL container
    * writer.
    */
  private[ops] def renderAvi(docId: Long): Array[Byte] = {
    val g = docId % Groups
    val frames = (0 until FrameN).map { f =>
      Array.tabulate(ImgH, ImgW) { (y, x) =>
        val v = lum(g, f, x, y)
        if (docId % PerturbMod == 0 && f == perturbFrame(docId) &&
          perturbIdx(docId) == y.toLong * ImgW + x) (v + 128) % 256
        else v
      }
    }
    Multimodal.encodeAviGray8(frames)
  }

  /** Signature bands from AVI bytes through the real demux: per-frame
    * dHash (the ImageDedup gradient contract) XOR-folded to 16 bits,
    * one band per sampled frame. None when the bytes don't parse or
    * the stream isn't the expected grid.
    */
  private[ops] def videoBands(avi: Array[Byte]): Option[(Int, Int, Int, Int)] =
    Multimodal.decodeAvi(avi).flatMap { case (meta, frames) =>
      if (meta.width != ImgW || meta.height != ImgH ||
        frames.size != FrameN) None
      else {
        val folds = frames.map { p =>
          Multimodal.aviFrameGray8(meta, p).map { l =>
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
            band(0) ^ band(1) ^ band(2) ^ band(3)
          }
        }
        if (folds.exists(_.isEmpty)) None
        else {
          val b = folds.map(_.get)
          Some((b(0), b(1), b(2), b(3)))
        }
      }
    }

  private val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("b0", IntegerType, nullable = false),
    StructField("b1", IntegerType, nullable = false),
    StructField("b2", IntegerType, nullable = false),
    StructField("b3", IntegerType, nullable = false)))

  private[graft] def videoSigs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sigSchema)
    docs.select(col("doc_id").cast(LongType))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          videoBands(renderAvi(id)).map { case (b0, b1, b2, b3) =>
            Row(id, b0, b1, b2, b3)
          }
        }
      }(enc)
  }

  /** The STORED signature artifact ([[MediaSigStore]], vidsig role) —
    * same lifecycle and cap governance as the image/audio twins; the
    * candidate/verify tail is [[ImageDedup.hammingPairs]] verbatim.
    */
  private def stored(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    MediaSigStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      MediaSigStore.videoTag(dir), videoSigs)

  // ---------------------------------------------------------------- SQL
  // Oracle: the folded per-frame dHash computed ANALYTICALLY from the
  // luminance contract (DIB-8 roundtrip is lossless, so formula ==
  // demuxed raster — VideoDedupSpec pins that equivalence).

  private val sigSqlCtes: String = {
    val hex = "'0123456789abcdef'"
    val fpp = ImgW * ImgH // pixels per frame in the flat 288-list
    // flat index i in 0..287: f = i//72, pixel p = i%72, x = p%9, y = p//9
    val key = s"g::VARCHAR||':'||(i//$fpp)::VARCHAR||':'||" +
      s"((i%$fpp)%$ImgW)::VARCHAR||':'||((i%$fpp)//$ImgW)::VARCHAR"
    // 1-based flat lum index of frame f, row y, col x
    def li(f: Int, y: Int, x: Int): Int = f * fpp + y * ImgW + x + 1
    def bandSql(f: Int, m: Int): String =
      (0 until 16).map { j =>
        val y = 2 * m + j / 8
        val x = j % 8
        s"(CASE WHEN L[${li(f, y, x + 1)}] > L[${li(f, y, x)}] " +
          s"THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
    def foldSql(f: Int): String =
      s"xor(xor(f${f}m0, f${f}m1), xor(f${f}m2, f${f}m3))"
    val rawCols = (0 until FrameN).flatMap(f => (0 until 4).map(m =>
      s"${bandSql(f, m)} AS f${f}m$m")).mkString(",\n|    ")
    s"""vids AS (SELECT doc_id, doc_id % $Groups AS g,
       |    doc_id % $PerturbMod = 0 AS pert FROM documents),
       |lum0 AS (SELECT doc_id, pert,
       |    list_transform(range(0, ${FrameN * fpp}),
       |    i -> (strpos($hex, substr(md5($key),1,1))-1)*16
       |       + strpos($hex, substr(md5($key),2,1))-1) AS L0 FROM vids),
       |lum AS (SELECT doc_id, list_transform(range(0, ${FrameN * fpp}),
       |    i -> CASE WHEN pert AND i = (doc_id%$FrameN)*$fpp
       |        + (doc_id%$ImgH)*$ImgW + (doc_id%$ImgW)
       |      THEN (L0[i+1]+128)%256 ELSE L0[i+1] END) AS L FROM lum0),
       |raw AS (SELECT doc_id,
       |    $rawCols
       |  FROM lum),
       |sig AS (SELECT doc_id, ${foldSql(0)} AS b0, ${foldSql(1)} AS b1,
       |    ${foldSql(2)} AS b2, ${foldSql(3)} AS b3 FROM raw),
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
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_dedup_video",
      "Video perceptual dedup — the dedup matrix's fourth media column " +
        "and the retirement of the last decode stub: per-frame dHash " +
        "through a REAL pure-JDK AVI demux (RIFF walk, DIB-8 raster " +
        s"reconstruction), XOR-folded to one 16-bit band per $FrameN " +
        "sampled frames, capped band equi-join candidates, exact " +
        s"Hamming verify at <= $HamT. Corpus synthesized from doc_id " +
        s"(doc_id % $Groups groups share a base video; every " +
        s"${PerturbMod}th doc is a planted one-pixel-one-frame " +
        "near-dup) through the real container writer, so the bytes are " +
        "genuine AVI; DIB-8 losslessness (spec-pinned) lets the oracle " +
        "compute the same signature analytically.",
      (s, dir) => {
        val (sigs, bands) = stored(s, dir)
        ImageDedup.hammingPairs(sigs, bands)
          .filter(col("hamming") <= HamT)
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH $sigSqlCtes
              |SELECT id_a, id_b, hamming FROM ham WHERE hamming <= $HamT
              |ORDER BY id_a, id_b""".stripMargin)
    ),

    QueryDef(
      "q_video_recall",
      "Measured precision/recall of the video folded-dHash candidate " +
        "stage against exact all-pairs Hamming truth on a fixed panel " +
        s"(doc_id % $PanelMod == 0) — the falsifiability row for the " +
        "fold+banding, sharing the ImageDedup recallRow definition and " +
        "oracle tail (one measurement shape across all media columns). " +
        "A planted one-pixel twin flips <= 2 bits of ONE band (the XOR " +
        "fold preserves bit positions), leaving >= 3 of 4 bands " +
        "intact, so planted recall should measure 1.0.",
      (s, dir) => {
        val (sigs, bands) = stored(s, dir)
        ImageDedup.recallRow(sigs, bands, PanelMod, HamT)
      },
      Some(s"""WITH $sigSqlCtes,
              |${ImageDedup.recallSqlTail(PanelMod, HamT)}""".stripMargin)
    )
  )
}
