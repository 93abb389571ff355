package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Video dedup honesty pins: the synthetic AVIs are REAL containers
  * (written and re-parsed byte-by-byte), DIB-8 frames roundtrip
  * losslessly (demuxed raster == the generating formula — the fact
  * that lets the analytic oracle check the codec path at all), the
  * planted-twin geometry holds through the XOR fold, and the MJPG
  * route decodes through the genuine JDK JPEG codec.
  */
class VideoDedupSpec extends SparkSpec {
  import spark.implicits._

  test("AVI DIB-8 roundtrip is lossless: demuxed rasters == formula") {
    for (id <- Seq(1L, 5L, 97L, 101L, 110L)) { // incl. perturbed (5, 110)
      val bytes = VideoDedup.renderAvi(id)
      val (meta, frames) = Multimodal.decodeAvi(bytes).get
      assert(meta.width == 9 && meta.height == 8 && meta.nFrames == 4 &&
        meta.bitCount == 8 && meta.fourcc == "DIB ")
      assert(frames.size == 4)
      val g = id % 101
      for (f <- 0 until 4) {
        val raster = Multimodal.aviFrameGray8(meta, frames(f)).get
        for (y <- 0 until 8; x <- 0 until 9) {
          var exp = VideoDedup.lum(g, f, x, y)
          if (id % 5 == 0 && f == (id % 4).toInt &&
            (id % 8) * 9 + (id % 9) == y.toLong * 9 + x)
            exp = (exp + 128) % 256
          assert(raster(y)(x) == exp,
            s"doc $id frame $f pixel ($x,$y): got ${raster(y)(x)} exp $exp")
        }
      }
    }
  }

  test("decodeAvi rejects junk; videoBands rejects wrong shapes") {
    assert(Multimodal.decodeAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeAvi(
      "RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(VideoDedup.videoBands(
      AudioDedup.renderWav(7L)).isEmpty, "a WAV is not an AVI")
    // wrong grid: a 2-frame 3x2 AVI parses but is not the signature shape
    val odd = Multimodal.encodeAviGray8(
      Seq.fill(2)(Array.tabulate(2, 3)((y, x) => y * 3 + x)))
    assert(Multimodal.decodeAvi(odd).isDefined)
    assert(VideoDedup.videoBands(odd).isEmpty)
  }

  // little-endian byte builder shared by the malformed-size and
  // audio-first container tests below
  private def le(parts: Seq[Either[String, Long]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach {
      case Left(s) => out.write(s.getBytes("US-ASCII"))
      case Right(v) => (0 until 4).foreach(i =>
        out.write(((v >> (8 * i)) & 0xff).toInt))
    }
    out.toByteArray
  }
  private def a(s: String): Either[String, Long] = Left(s)
  private def n(v: Long): Either[String, Long] = Right(v)

  test("decodeAvi/decodeWav terminate as None on a crafted chunk size " +
    "that wraps negative through toInt (0xFFFFFFF8 would stall the " +
    "walk forever before the r12 guard)") {
    val avi = le(Seq(a("RIFF"), n(64), a("AVI "),
      a("JUNK"), n(0xFFFFFFF8L), n(0), n(0), n(0), n(0)))
    assert(Multimodal.decodeAvi(avi).isEmpty)
    val wav = le(Seq(a("RIFF"), n(64), a("WAVE"),
      a("JUNK"), n(0xFFFFFFF8L), n(0), n(0), n(0), n(0),
      n(0), n(0), n(0), n(0), n(0), n(0)))
    assert(Multimodal.decodeWav(wav).isEmpty)
  }

  test("decodeAvi reads the VIDEO stream's strf in an audio-first AVI " +
    "(a 40-byte WAVEFORMATEXTENSIBLE must not be misread as the " +
    "BITMAPINFOHEADER)") {
    // hand-built: hdrl [avih, strl(auds: strh+strf 40B), strl(vids:
    // strh+strf 40B DIB-8)] + movi [one 00db frame], all sizes exact.
    val w = 4; val h = 2; val stride = 4 // (w+3)&~3
    val frame = Array.tabulate(h * stride)(i => (i * 7 % 251).toLong)
    val avih = Seq(a("avih"), n(56)) ++
      (0 until 14).map { i =>
        if (i == 4) n(1L) // dwTotalFrames at payload+16
        else if (i == 8) n(w.toLong) // dwWidth at payload+32
        else if (i == 9) n(h.toLong) // dwHeight at payload+36
        else n(0L)
      }
    def strh(fcc: String) = Seq(a("strh"), n(56), a(fcc), a("none")) ++
      (0 until 12).map(_ => n(0L))
    // 40-byte audio strf: wBitsPerSample=16 sits at payload+14 — the
    // bytes the video parse would read as biBitCount
    val strfAud = Seq(a("strf"), n(40),
      n(0xFFFEL | (2L << 16)), n(48000), n(192000),
      n(4L | (16L << 16)), n(22L | (16L << 16)), n(0), n(0),
      n(0x00000001L), n(0x71L), n(0))
    // BITMAPINFOHEADER: biSize..biClrImportant (40 bytes), bitCount=8
    // at payload+14, compression=0 (DIB) at payload+16
    val strfVid = Seq(a("strf"), n(40),
      n(40), n(w.toLong), n(h.toLong), n(1L | (8L << 16)), n(0),
      n((stride * h).toLong), n(0), n(0), n(0), n(0))
    def list(typ: String, body: Seq[Either[String, Long]]) = {
      val sz = le(body).length + 4
      Seq(a("LIST"), n(sz.toLong), a(typ)) ++ body
    }
    val strlAud = list("strl", strh("auds") ++ strfAud)
    val strlVid = list("strl", strh("vids") ++ strfVid)
    val hdrl = list("hdrl", avih ++ strlAud ++ strlVid)
    val movi = list("movi",
      Seq(a("00db"), n((stride * h).toLong)) ++
        frame.grouped(4).map(g =>
          n(g.zipWithIndex.map { case (b, i) => b << (8 * i) }.sum)).toSeq)
    val body = hdrl ++ movi
    val bytes = le(Seq(a("RIFF"), n((le(body).length + 4).toLong),
      a("AVI ")) ++ body)
    val parsed = Multimodal.decodeAvi(bytes)
    assert(parsed.isDefined, "audio-first AVI must still parse")
    val (meta, frames) = parsed.get
    assert(meta.bitCount == 8 && meta.fourcc == "DIB " &&
      meta.width == w && meta.height == h,
      s"video strf must win over the audio strf: $meta")
    assert(frames.size == 1 && frames.head.length == stride * h)
  }

  test("planted twins pair up; cross-group videos don't") {
    val ids = Seq(3L, 104L, 205L, // group 3: 104=3+101, 205=3+2*101 (205%5==0 -> perturbed)
      7L, 108L) // group 7: 108 = 7+101
    val sigs = VideoDedup.videoSigs(ids.toDF("doc_id"))
    val bands = MediaSigStore.bandRows(sigs)
      .withColumn("bsz", lit(1L)) // under any cap; pair path under test
    val pairs = ImageDedup.hammingPairs(sigs, bands)
      .filter(col("hamming") <= VideoDedup.HamT)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 104L), (3L, 205L), (104L, 205L), (7L, 108L)),
      s"got $pairs")
    // the perturbed twin stays within the one-band bound (0 is legal:
    // a flip that preserves both neighbor-comparison signs moves no bit)
    val ham = ImageDedup.hammingPairs(sigs, bands)
      .filter(col("id_a") === 3L && col("id_b") === 205L)
      .select("hamming").as[Long].head()
    assert(ham <= 2, s"one flipped pixel => at most 2 bits, got $ham")
  }

  test("q_video_recall measures 1.0/1.0 on the planted corpus (sf0.001)") {
    val r = graft.Registry.queryMap("q_video_recall")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Long]("n_true_pairs") > 0, "panel must have real pairs")
  }

  test("MJPG frames decode through the real JDK JPEG codec") {
    // build a JPEG frame with ImageIO, wrap it in a hand-built MJPG AVI
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 12).foreach(y => (0 until 16).foreach(x =>
      img.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)))
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val jpeg = jb.toByteArray
    // take a DIB AVI skeleton and splice: simplest honest MJPG container
    // is written directly here (fourcc MJPG, one 00dc chunk)
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u32(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def u16(v: Int): Unit =
      (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    val pad = jpeg.length & 1
    val strlSize = 4 + 8 + 56 + 8 + 40
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviSize = 4 + 8 + jpeg.length + pad
    ascii("RIFF"); u32(4 + 8 + hdrlSize + 8 + moviSize); ascii("AVI ")
    ascii("LIST"); u32(hdrlSize); ascii("hdrl")
    ascii("avih"); u32(56)
    u32(40000); u32(0); u32(0); u32(0); u32(1); u32(0); u32(1)
    u32(jpeg.length); u32(16); u32(12); (0 until 4).foreach(_ => u32(0))
    ascii("LIST"); u32(strlSize); ascii("strl")
    ascii("strh"); u32(56)
    ascii("vids"); ascii("MJPG")
    u32(0); u16(0); u16(0); u32(0); u32(1); u32(25); u32(0); u32(1)
    u32(jpeg.length); u32(0xFFFFFFFFL); u32(0)
    u16(0); u16(0); u16(16); u16(12)
    ascii("strf"); u32(40)
    u32(40); u32(16); u32(12); u16(1); u16(24)
    ascii("MJPG") // biCompression fourcc
    u32(jpeg.length); u32(0); u32(0); u32(0); u32(0)
    ascii("LIST"); u32(moviSize); ascii("movi")
    ascii("00dc"); u32(jpeg.length); bos.write(jpeg)
    if (pad == 1) bos.write(0)
    val avi = bos.toByteArray
    val (meta, frames) = Multimodal.decodeAvi(avi).get
    assert(meta.fourcc == "MJPG" && meta.width == 16 && meta.height == 12)
    assert(frames.size == 1)
    val dec = Multimodal.aviFrameImage(frames(0)).get
    assert(dec.getWidth == 16 && dec.getHeight == 12)
    // JPEG is lossy; the decoded frame must still be CLOSE to the source
    val diffs = for (y <- 0 until 12; x <- 0 until 16) yield
      math.abs(dec.getRaster.getSample(x, y, 0) - (x * 16 + y) % 256)
    assert(diffs.sum.toDouble / diffs.size < 32.0,
      "decoded MJPG frame should approximate the source")
  }

  test("sampleFrames: AVI bytes demux for real (decoded=true, true " +
    "frame count); junk falls back to the flagged stub") {
    val media = Seq(
      (1L, "video/avi", VideoDedup.renderAvi(9L)),
      (2L, "video/mp4", Array.fill[Byte](700)(42))) // no pure-JDK demuxer
      .toDF("media_id", "media_type", "content")
    val frames = Multimodal.sampleFrames(media, everyNth = 1)
      .select("media_id", "frame_idx", "n_frames", "decoded")
      .as[(Long, Int, Int, Boolean)].collect().toSeq
    val real = frames.filter(_._1 == 1L)
    assert(real.size == 4 && real.forall(_._4) &&
      real.forall(_._3 == 4), s"real demux rows: $real")
    val stub = frames.filter(_._1 == 2L)
    assert(stub.nonEmpty && stub.forall(!_._4),
      "non-AVI bytes must take the flagged stub")
  }
}
