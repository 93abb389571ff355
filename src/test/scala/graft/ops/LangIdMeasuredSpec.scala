package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Measured language ID: the naive-Bayes char-trigram scorer must LEARN
  * when the labels carry real character-distribution signal (planted
  * disjoint vocabularies -> held-out accuracy ~1.0), and must HONESTLY
  * measure ~chance when they don't (one shared vocabulary) — the pair of
  * planted corpora that makes the emitted accuracy row falsifiable in
  * both directions.
  */
class LangIdMeasuredSpec extends SparkSpec {
  import spark.implicits._

  // disjoint letter ranges per language -> fully distinctive trigrams
  private val vocabs = Map(
    "aa" -> Vector("abba", "cade", "bead", "dace", "ebbed"),
    "bb" -> Vector("fight", "jiffy", "high", "huff", "gig"),
    "cc" -> Vector("knoll", "moon", "pomp", "loom", "onion"))

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val d = Files.createTempDirectory("langspec").toString
    rows.map { case (id, t, l) => (id, t, l, "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def accuracy(dir: String): Map[String, (Long, Long, Double, Double)] =
    Registry.queryMap("q_lang_id_measured")(spark, dir)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("planted per-language vocabularies: held-out accuracy ~1.0") {
    val rnd = new scala.util.Random(11)
    val langs = vocabs.keys.toSeq.sorted
    // lang = id % 3: coprime with the train split's id % 2, so every
    // language appears in both halves
    val docs = (0L until 90L).map { id =>
      val lang = langs((id % 3).toInt)
      val words = Seq.fill(8 + rnd.nextInt(6))(
        vocabs(lang)(rnd.nextInt(vocabs(lang).size)))
      (id, words.mkString(" "), lang)
    }
    val acc = accuracy(writeDocs(docs))
    val (nEval, nCorrect, a, baseline) = acc("*")
    assert(nEval == 45L)
    assert(a >= 0.95, s"accuracy $a on fully-separable planted corpus")
    assert(nCorrect >= 43L)
    assert(a > baseline, "scorer must beat the majority baseline")
    // every language individually learnable
    langs.foreach(l => assert(acc(l)._3 >= 0.9, s"lang $l: ${acc(l)}"))
  }

  test("shared vocabulary (no signal): measured accuracy stays ~chance") {
    val rnd = new scala.util.Random(12)
    val shared = vocabs.values.flatten.toVector
    val langs = vocabs.keys.toSeq.sorted
    val docs = (0L until 90L).map { id =>
      val words = Seq.fill(8 + rnd.nextInt(6))(shared(rnd.nextInt(shared.size)))
      (id, words.mkString(" "), langs((id % 3).toInt))
    }
    val acc = accuracy(writeDocs(docs))
    val a = acc("*")._3
    // 3 balanced classes, zero signal: anything near 1/3 is honest;
    // well-separated from the separable corpus's 1.0
    assert(a <= 0.6, s"no-signal corpus scored $a — leakage?")
  }
}
