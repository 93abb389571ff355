package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Audio perceptual dedup: the PCM-roundtrip level contract (what makes
  * the analytic oracle sound), planted-twin pair detection, and malformed
  * input rejection.
  */
class AudioDedupSpec extends SparkSpec {
  import spark.implicits._

  test("WAV u8 roundtrip is exact: decoded frame means == level formula") {
    for (id <- Seq(0L, 5L, 94L, 183L, 250L)) {
      val wav = AudioDedup.renderWav(id)
      // the real header parse accepts the canonical container
      val hdr = Multimodal.decodeWav(wav)
      assert(hdr.contains((8000, 1, 8, 1040L)), s"id=$id header $hdr")
      val samples = AudioDedup.pcmU8Samples(wav).get
      assert(samples.length == 65 * 16)
      val g = id % 89
      for (f <- 0 until 65) {
        var exp = AudioDedup.level(g, f)
        if (id % 5 == 0 && f == (id % 65)) exp = (exp + 128) % 256
        val mean = (0 until 16).map(j => samples(f * 16 + j)).sum / 16
        assert(mean == exp, s"id=$id frame $f")
      }
    }
  }

  test("levelBands rejects non-WAV bytes and wrong shapes") {
    assert(AudioDedup.levelBands("not audio".getBytes).isEmpty)
    // valid header but truncated payload: wrong grid -> rejected
    val wav = AudioDedup.renderWav(1L)
    assert(AudioDedup.levelBands(wav.take(44 + 100)).isEmpty)
  }

  test("planted twins pair up; cross-group clips don't") {
    val d = Files.createTempDirectory("audiospec").toString
    // group g=5: ids 5 (perturbed), 94, 183; group g=7: ids 7, 96
    Seq(5L, 7L, 94L, 96L, 183L)
      .map(id => (id, s"doc $id", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val pairs = Registry.queryMap("q_dedup_audio")(spark, d)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.keySet == Set((5L, 94L), (5L, 183L), (94L, 183L), (7L, 96L)))
    assert(pairs((94L, 183L)) == 0L) // both unperturbed: identical
    assert(pairs((7L, 96L)) == 0L)
    assert(pairs((5L, 94L)) <= 2L)   // one flipped frame: <= 2 bits
    assert(pairs((5L, 183L)) <= 2L)
  }

  test("q_audio_recall measures 1.0 on a planted all-even panel") {
    val d = Files.createTempDirectory("audiorec").toString
    // all ids even -> whole corpus is the panel; groups: (6,184) g=6,
    // (10,188) g=10, 12 singleton (184%89=6, 188%89=10)
    Seq(6L, 184L, 10L, 188L, 12L)
      .map(id => (id, s"doc $id", "en", "s0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val (nPanel, nTrue, nCand, nHits, precision, recall) =
      Registry.queryMap("q_audio_recall")(spark, d)
        .as[(Long, Long, Long, Long, Double, Double)].collect().head
    assert(nPanel == 5L && nTrue == 2L && nHits == 2L && nCand >= 2L)
    assert(recall == 1.0)
    assert(precision == 1.0 || nCand > nHits)
  }
}
