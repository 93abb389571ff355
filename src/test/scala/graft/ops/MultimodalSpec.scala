package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  /** Deterministic in-test image bytes — no fixtures, pure JDK. */
  private def pngBytes(w: Int, h: Int, gray: Boolean = false): Array[Byte] = {
    val t = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, t)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic in-test WAV bytes — canonical RIFF/WAVE layout built
    * byte-by-byte (no javax.sound), optionally with an extra chunk
    * before `data` to exercise the chunk walk, and odd-sized chunks to
    * exercise word-alignment padding.
    */
  private def wavBytes(rate: Int, channels: Int, bits: Int, frames: Int,
                       extraChunk: Boolean = false): Array[Byte] = {
    val block = channels * bits / 8
    val dataSize = frames * block
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def u16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = (0 until 4).foreach(i =>
      bos.write(((v >> (8 * i)) & 0xff).toInt))
    val extra = if (extraChunk) 8 + 7 + 1 else 0 // odd chunk + pad byte
    ascii("RIFF"); u32(4 + 24 + extra + 8 + dataSize); ascii("WAVE")
    ascii("fmt "); u32(16)
    u16(1); u16(channels); u32(rate)
    u32(rate.toLong * block); u16(block); u16(bits)
    if (extraChunk) { ascii("LIST"); u32(7); (0 until 7).foreach(bos.write); bos.write(0) }
    ascii("data"); u32(dataSize)
    (0 until dataSize).foreach(i => bos.write((i * 7) & 0xff))
    bos.toByteArray
  }

  test("decodeWav: real RIFF/WAVE header parse — sample rate, channels, " +
    "bits, frame count; chunk-walk skips odd-sized chunks with pad; " +
    "None for non-WAV bytes (r8 verdict #6)") {
    assert(Multimodal.decodeWav(wavBytes(8000, 1, 16, 2000)) ==
      Some((8000, 1, 16, 2000L)))
    assert(Multimodal.decodeWav(wavBytes(44100, 2, 16, 441)) ==
      Some((44100, 2, 16, 441L)))
    // fmt after an odd-sized LIST chunk: alignment walk must land on data
    assert(Multimodal.decodeWav(wavBytes(16000, 1, 8, 123, extraChunk = true)) ==
      Some((16000, 1, 8, 123L)))
    assert(Multimodal.decodeWav("RIFFnotawave".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWav(pngBytes(8, 8)).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
  }

  test("extractAudioFeatures: WAV rows parse real metadata " +
    "(decoded=true, integer-exact duration); non-WAV bytes fall to the " +
    "stub (decoded=false, sample_rate 0); nulls pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, wavBytes(8000, 1, 16, 2000)), // 250 ms mono
      (2L, wavBytes(44100, 2, 16, 44100)), // 1 s stereo
      (3L, "just text".getBytes("UTF-8")),
      (4L, null)
    ).toDF("id", "blob")
    val rows = Multimodal.extractAudioFeatures(df, "id", "blob")
      .orderBy("media_id").collect()
    val m1 = rows(0).getStruct(2)
    assert(m1.getInt(2) == 8000 && m1.getInt(3) == 1 && m1.getInt(4) == 16)
    assert(m1.getLong(5) == 2000L && m1.getLong(6) == 250L && m1.getBoolean(7))
    val m2 = rows(1).getStruct(2)
    assert(m2.getInt(2) == 44100 && m2.getInt(3) == 2 &&
      m2.getLong(6) == 1000L && m2.getBoolean(7))
    val m3 = rows(2).getStruct(2)
    assert(!m3.getBoolean(7) && m3.getInt(2) == 0)
    assert(rows(3).isNullAt(2))
  }

  test("decodeImage: real javax.imageio dimensions/channels for PNG, " +
    "None for non-image bytes (r7 verdict #4)") {
    assert(Multimodal.decodeImage(pngBytes(37, 21)) == Some((37, 21, 3)))
    assert(Multimodal.decodeImage(pngBytes(5, 9, gray = true)) == Some((5, 9, 1)))
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures decodes real PNG bytes: width/height/channels " +
    "from the codec, decoded=true; text bytes fall back to the stub, " +
    "decoded=false") {
    import spark.implicits._
    val df = Seq(
      (1L, pngBytes(37, 21)),
      (2L, "just text bytes".getBytes("UTF-8")))
      .toDF("id", "blob")
    val rows = Multimodal.extractFeatures(df, "id", "blob", "image/png")
      .orderBy("media_id").collect()
    val real = rows(0).getStruct(3)
    assert(real.getInt(2) == 37 && real.getInt(3) == 21)
    assert(real.getInt(4) == 3 && real.getBoolean(5))
    assert(real.getString(1) == "89504E47") // PNG magic
    val fake = rows(1).getStruct(3)
    assert(!fake.getBoolean(5) && fake.getInt(4) == 0)
    assert(fake.getInt(2) >= 64 && fake.getInt(2) < 1024)
  }

  test("resize really rescales decodable images: output bytes re-decode " +
    "at the target dimensions") {
    import spark.implicits._
    val df = Seq((1L, pngBytes(64, 48))).toDF("id", "blob")
    val media = Multimodal.extractFeatures(df, "id", "blob", "image/png")
    val out = Multimodal.resize(media, 16, 12).collect()(0)
    val meta = out.getStruct(3)
    assert(meta.getInt(2) == 16 && meta.getInt(3) == 12 && meta.getBoolean(5))
    // the content column holds a real PNG of the target size
    assert(Multimodal.decodeImage(out.getAs[Array[Byte]](2))
      == Some((16, 12, 3)))
  }

  test("extractFeatures: schema, determinism, null propagation (H5)") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("fake-png-bytes-here")),
      (2L, Some("other-blob")),
      (3L, Option.empty[String]))
      .toDF("id", "payload")
      .withColumn("blob", col("payload").cast("binary"))
    val out = Multimodal.extractFeatures(df, "id", "blob", "image/png")
    assert(out.schema == Multimodal.mediaSchema)
    val rows = out.orderBy("media_id").collect()
    assert(rows.length == 3)
    val r1 = rows(0)
    assert(r1.getString(1) == "image/png")
    val meta = r1.getStruct(3)
    assert(meta.getInt(0) == "fake-png-bytes-here".length)
    assert(meta.getString(1) == "66616B65") // hex of "fake"
    assert(meta.getInt(2) >= 64 && meta.getInt(2) < 1024)
    assert(rows(2).isNullAt(3) && rows(2).isNullAt(2)) // null blob -> null meta
    // determinism: same input, same fake dimensions
    val again = Multimodal.extractFeatures(df, "id", "blob", "image/png")
      .orderBy("media_id").collect()
    assert(again.sameElements(rows) ||
      again.zip(rows).forall { case (a, b) => a == b })
  }

  test("decodeStub is deterministic and bounded") {
    val b = "same-bytes".getBytes("UTF-8")
    assert(Multimodal.decodeStub(b) == Multimodal.decodeStub(b.clone()))
    val (w, h) = Multimodal.decodeStub(b)
    assert(w >= 64 && w < 1024 && h >= 64 && h < 1024)
  }

  test("resize keeps schema, updates meta dims, passes nulls through") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a-blob-of-reasonable-length-for-resize")),
      (2L, Option.empty[String]))
      .toDF("id", "payload")
      .withColumn("blob", col("payload").cast("binary"))
    val media = Multimodal.extractFeatures(df, "id", "blob", "image/png")
    val out = Multimodal.resize(media, 128, 96)
    assert(out.schema == Multimodal.mediaSchema)
    val rows = out.orderBy("media_id").collect()
    val meta = rows(0).getStruct(3)
    assert(meta.getInt(2) == 128 && meta.getInt(3) == 96)
    assert(meta.getInt(0) == rows(0).getAs[Array[Byte]](2).length)
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3)) // null row untouched
    // determinism
    val again = Multimodal.resize(media, 128, 96).orderBy("media_id").collect()
    assert(again.zip(rows).forall { case (a, b) => a == b })
  }

  test("sampleFrames fans one video row out to every Nth frame") {
    import spark.implicits._
    val blob = Array.tabulate[Byte](640)(i => (i % 97).toByte) // 10 fake frames
    val media = Seq((7L, "video/mp4", blob))
      .toDF("media_id", "media_type", "content")
      .withColumn("meta", lit(null).cast(Multimodal.mediaSchema("meta").dataType))
    val all = Multimodal.sampleFrames(media, everyNth = 1)
      .orderBy("frame_idx").collect()
    assert(all.length == 10 && all.forall(_.getInt(3) == 10))
    assert(all.map(_.getInt(1)).toSeq == (0 until 10))
    // frames partition the blob: concatenation round-trips the bytes
    val concat = all.flatMap(_.getAs[Array[Byte]](2))
    assert(concat.toSeq == blob.toSeq)
    val sampled = Multimodal.sampleFrames(media, everyNth = 4)
      .orderBy("frame_idx").collect()
    assert(sampled.map(_.getInt(1)).toSeq == Seq(0, 4, 8))
    // null/empty content yields no rows
    val noRows = Multimodal.sampleFrames(
      media.withColumn("content", lit(null).cast("binary")), 1).count()
    assert(noRows == 0L)
  }
}
