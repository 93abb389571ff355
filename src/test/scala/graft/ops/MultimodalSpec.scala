package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

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
}
