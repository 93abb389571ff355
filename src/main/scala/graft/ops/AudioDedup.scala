package graft.ops

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Audio perceptual dedup — the third media column of the dedup family
  * (text LSH → image dHash r11 → audio here): a frame-LEVEL gradient
  * signature (the audio analogue of dHash: 65 frame levels → 64
  * comparison bits) computed through the REAL RIFF/WAVE parse
  * ([[Multimodal.decodeWav]] validates the container; the PCM payload
  * is walked chunk-exactly), banded 4×16-bit Hamming-LSH, band
  * equi-join candidates, exact Hamming verify — the same skeleton as
  * [[ImageDedup]], so the three media types share one retrieval shape.
  *
  * CORPUS: synthesized deterministically from doc_id (the testdata has
  * no audio column): each doc renders a canonical 44-byte-header mono
  * 8-bit PCM WAV of 65 frames × 16 samples, frame f's samples all equal
  * to an md5-derived level of the doc's GROUP (doc_id % [[Groups]]),
  * with every [[PerturbMod]]-th doc getting ONE frame level flipped (a
  * planted near-duplicate: one frame disturbs at most two comparison
  * bits across at most two bands — frames 16/32/48 sit on a band
  * boundary, so the two straddling comparisons land one bit in each
  * neighbor — leaving >= 2 of 4 bands intact either way; the image case
  * genuinely stays in one band because its bands span whole rows). PCM
  * u8 is lossless and frames are constant,
  * so the decoded per-frame MEAN equals the generating level exactly
  * (spec-pinned) — which is what lets the DuckDB oracle compute the
  * same signature analytically. A real deployment swaps the synthesis
  * for the corpus's audio column and the mean becomes a real frame
  * energy; every stage downstream of the level vector is unchanged.
  *
  * Scale shape: identical to ImageDedup — decode+hash is one narrow
  * partition-parallel pass, everything after is relational on 4 ints
  * per clip; band join linear in bucket sizes, hot buckets cappable;
  * signatures a stored artifact in production.
  */
object AudioDedup {

  private val Frames = 65          // 65 levels -> 64 gradient bits
  private val SamplesPerFrame = 16
  private val Groups = 89
  private val PerturbMod = 5
  private[graft] val HamT = 6
  private val PanelMod = 2

  /** Frame-level contract shared by the renderer and the oracle: first
    * md5 byte of "g:f".
    */
  private[ops] def level(g: Long, f: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s"$g:$f".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0) & 0xff
  }

  /** Render doc `docId`'s mono 8-bit PCM WAV (canonical RIFF layout —
    * the exact container [[Multimodal.decodeWav]] parses).
    */
  private[ops] def renderWav(docId: Long): Array[Byte] = {
    val g = docId % Groups
    val dataLen = Frames * SamplesPerFrame
    val bos = new java.io.ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def u16(v: Int): Unit =
      (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    ascii("RIFF"); u32(36L + dataLen); ascii("WAVE")
    ascii("fmt "); u32(16); u16(1); u16(1) // PCM, mono
    u32(8000); u32(8000); u16(1); u16(8)   // rate, byteRate, align, bits
    ascii("data"); u32(dataLen)
    var f = 0
    while (f < Frames) {
      var v = level(g, f)
      if (docId % PerturbMod == 0 && f == (docId % Frames).toInt)
        v = (v + 128) % 256
      var j = 0
      while (j < SamplesPerFrame) { bos.write(v); j += 1 }
      f += 1
    }
    bos.toByteArray
  }

  /** PCM u8 payload of a WAV whose header [[Multimodal.decodeWav]]
    * accepts: the `data` chunk's unsigned bytes (clamped to the buffer,
    * matching decodeWav's truncation rule). None for anything that is
    * not a well-formed 8-bit mono WAV.
    */
  private[ops] def pcmU8Samples(bytes: Array[Byte]): Option[Array[Int]] =
    Multimodal.decodeWav(bytes).flatMap { case (_, ch, bits, _) =>
      if (ch != 1 || bits != 8) None
      else {
        def tag(o: Int) =
          new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        def u32(o: Int): Long =
          (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        var off = 12
        var out: Option[Array[Int]] = None
        while (out.isEmpty && off + 8 <= bytes.length) {
          val size = u32(off + 4)
          if (tag(off) == "data") {
            val n = math.min(size, (bytes.length - off - 8).toLong).toInt
            out = Some(Array.tabulate(n)(i => bytes(off + 8 + i) & 0xff))
          }
          off = off + 8 + size.toInt + (size.toInt & 1)
        }
        out
      }
    }

  /** Signature bands from WAV bytes through the real parse: per-frame
    * integer-mean levels → 64 gradient bits packed as 4×16-bit bands
    * (bit j of band k compares frames 16k+j and 16k+j+1). None when the
    * bytes don't parse or the clip isn't the expected grid.
    */
  private[ops] def levelBands(wav: Array[Byte]): Option[(Int, Int, Int, Int)] =
    pcmU8Samples(wav).flatMap { s =>
      if (s.length != Frames * SamplesPerFrame) None
      else {
        val lv = Array.tabulate(Frames) { f =>
          var sum = 0
          var j = 0
          while (j < SamplesPerFrame) { sum += s(f * SamplesPerFrame + j); j += 1 }
          sum / SamplesPerFrame
        }
        def band(k: Int): Int = {
          var v = 0
          var j = 0
          while (j < 16) {
            if (lv(16 * k + j + 1) > lv(16 * k + j)) v |= 1 << j
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

  private[graft] def levelSigs(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(sigSchema)
    docs.select(col("doc_id").cast(LongType))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          levelBands(renderWav(id)).map { case (b0, b1, b2, b3) =>
            Row(id, b0, b1, b2, b3)
          }
        }
      }(enc)
  }

  /** The STORED signature artifact ([[MediaSigStore]], audsig role) —
    * same lifecycle as the image family; the candidate/verify tail is
    * [[ImageDedup.hammingPairs]] verbatim (shared skeleton).
    */
  private def stored(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    MediaSigStore.buildOrLoad(s, Tables.par(s, dir, "documents"),
      MediaSigStore.audioTag(dir), levelSigs)

  // Oracle: the signature computed analytically from the level contract
  // (constant frames + lossless PCM u8: decoded mean == formula).
  private val sigSqlCtes: String = {
    val hex = "'0123456789abcdef'"
    val key = s"g::VARCHAR||':'||f::VARCHAR"
    def bandSql(k: Int): String =
      (0 until 16).map { j =>
        val i1 = 16 * k + j + 1 // 1-based level(f)
        s"(CASE WHEN L[${i1 + 1}] > L[$i1] THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
    s"""clips AS (SELECT doc_id, doc_id % $Groups AS g,
       |    doc_id % $PerturbMod = 0 AS pert FROM documents),
       |lv0 AS (SELECT doc_id, pert, list_transform(range(0, $Frames),
       |    f -> (strpos($hex, substr(md5($key),1,1))-1)*16
       |       + strpos($hex, substr(md5($key),2,1))-1) AS L0 FROM clips),
       |lv AS (SELECT doc_id, list_transform(range(0, $Frames),
       |    f -> CASE WHEN pert AND f = doc_id % $Frames
       |      THEN (L0[f+1]+128)%256 ELSE L0[f+1] END) AS L FROM lv0),
       |sig AS (SELECT doc_id, ${bandSql(0)} AS b0, ${bandSql(1)} AS b1,
       |    ${bandSql(2)} AS b2, ${bandSql(3)} AS b3 FROM lv),
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
      "q_dedup_audio",
      "Audio perceptual dedup: frame-level gradient signature (65 frame " +
        "levels -> 64 bits, the dHash idea on PCM frames) through the " +
        "REAL RIFF/WAVE parse, banded 4x16-bit Hamming LSH, band " +
        s"equi-join candidates, exact Hamming verify at <= $HamT. " +
        s"Corpus synthesized from doc_id (doc_id % $Groups groups share " +
        s"a base clip; every ${PerturbMod}th doc is a planted one-frame " +
        "near-dup); constant frames + lossless PCM u8 (spec-pinned) " +
        "let the oracle compute the same signature analytically — the " +
        "ImageDedup pattern on the audio column, completing the " +
        "text/embedding/image/audio dedup matrix.",
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
      "q_audio_recall",
      "Measured precision/recall of the audio frame-signature candidate " +
        s"stage against exact all-pairs Hamming truth on a fixed panel " +
        s"(doc_id % $PanelMod == 0) — the falsifiability row for the " +
        "audio banding, sharing the ImageDedup recallRow definition and " +
        "oracle tail (one measurement shape across the media columns). " +
        "A planted one-frame twin flips <= 2 bits across <= 2 bands " +
        "(boundary frames 16/32/48 straddle two), leaving >= 2 of 4 " +
        "bands intact, so planted recall should measure 1.0.",
      (s, dir) => {
        val (sigs, bands) = stored(s, dir)
        ImageDedup.recallRow(sigs, bands, PanelMod, HamT)
      },
      Some(s"""WITH $sigSqlCtes,
              |${ImageDedup.recallSqlTail(PanelMod, HamT)}""".stripMargin)
    )
  )
}
