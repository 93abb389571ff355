package graft.ops

import graft.{Registry, SparkSpec}
import java.nio.file.Files

/** Image perceptual dedup: the PNG-roundtrip pixel contract (what makes
  * the analytic oracle sound), planted-twin pair detection, and the
  * measured recall row.
  */
class ImageDedupSpec extends SparkSpec {
  import spark.implicits._

  test("PNG gray8 roundtrip is lossless: decoded raster == formula") {
    // Representative ids: unperturbed, perturbed (id % 5 == 0), and the
    // id=0 corner (perturbed, pixel (0,0)).
    for (id <- Seq(0L, 3L, 100L, 197L, 250L)) {
      val png = ImageDedup.renderPng(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == 9 && img.getHeight == 8)
      val g = id % 97
      for (y <- 0 until 8; x <- 0 until 9) {
        var exp = ImageDedup.lum(g, x, y)
        if (id % 5 == 0 && x == (id % 9) && y == (id % 8)) exp = (exp + 128) % 256
        assert(img.getRaster.getSample(x, y, 0) == exp,
          s"id=$id pixel ($x,$y)")
      }
    }
  }

  test("dhashBands rejects non-image bytes and wrong dimensions") {
    assert(ImageDedup.dhashBands("not a png".getBytes).isEmpty)
    // a real PNG of the wrong grid size must be rejected, not mis-hashed
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(ImageDedup.dhashBands(bos.toByteArray).isEmpty)
  }

  private def writeDocs(ids: Seq[Long]): String = {
    val d = Files.createTempDirectory("imgspec").toString
    ids.map(id => (id, s"doc $id", "en", "src0", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("planted twins pair up; cross-group images don't") {
    // group g=3: ids 3, 100 (perturbed: 100%5==0), 197; group g=7: ids
    // 7, 104 — two clusters, no cross-cluster duplicates.
    val d = writeDocs(Seq(3L, 7L, 100L, 104L, 197L))
    val pairs = Registry.queryMap("q_dedup_image")(spark, d)
      .as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.keySet == Set((3L, 100L), (3L, 197L), (100L, 197L), (7L, 104L)))
    assert(pairs((3L, 197L)) == 0L)   // both unperturbed: identical
    assert(pairs((7L, 104L)) == 0L)
    assert(pairs((3L, 100L)) <= 2L)   // one flipped pixel: <= 2 bits
    assert(pairs((100L, 197L)) <= 2L)
  }

  test("q_image_recall measures 1.0 on the planted corpus") {
    // all ids even -> whole corpus is the panel
    val d = writeDocs(Seq(6L, 200L, 10L, 204L, 12L))
    // groups: 6,200 -> g=6; 10,204 -> g=10; 12 -> g=12 (singleton)
    val row = Registry.queryMap("q_image_recall")(spark, d)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    val (nPanel, nTrue, nCand, nHits, precision, recall) = row
    assert(nPanel == 5L)
    assert(nTrue == 2L) // (6,200) and (10,204)
    assert(nHits == 2L && nCand >= 2L)
    assert(recall == 1.0)
    assert(precision == 1.0 || nCand > nHits) // collisions only lower it
  }
}
