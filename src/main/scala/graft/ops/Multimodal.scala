package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY.md §2 H5 + the training-pipeline
  * mandate): image/audio/video travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extract run per-partition so a
  * 100 TB corpus streams through executors in bounded batches.
  *
  * The decode step itself is STUBBED (no image/audio libs in this
  * container): [[decodeStub]] produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, partition-parallel
  * execution shape, batch iteration, null handling — is real and tested.
  * Swapping in a real decoder means replacing ONLY the body of
  * [[decodeStub]].
  */
object Multimodal {

  /** Canonical multimodal record schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("magic_hex", StringType, nullable = true),
      StructField("fake_width", IntegerType, nullable = false),
      StructField("fake_height", IntegerType, nullable = false))),
      nullable = true)))

  /** STUB decode: a real implementation would decode image bytes here
    * (per-partition, so decoder init cost amortizes across the batch).
    * The fake is deterministic: a rolling byte hash seeds "dimensions".
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    var h = 17L
    var i = 0
    while (i < math.min(bytes.length, 256)) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(h) % 960).toInt // fake 64..1023 px
    val ht = 64 + (math.abs(h / 1024) % 960).toInt
    (w, ht)
  }

  /** Wrap a (id, binary) DataFrame into the canonical media schema,
    * running the (stubbed) decoder once per row, partition-parallel —
    * the Scala analogue of a mapInPandas batch UDF.
    */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String,
                      mediaType: String): DataFrame = {
    val enc = RowEncoder.encoderFor(mediaSchema)
    df.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          if (bytes == null) Row(id, mediaType, null, null)
          else {
            val (w, h) = decodeStub(bytes)
            val magic = bytes.take(4).map("%02X".format(_)).mkString
            Row(id, mediaType, bytes, Row(bytes.length, magic, w, h))
          }
        }
      }(enc)
  }
}

/** Declared multimodal queries — the oracle-checkable subset (pure SQL
  * byte plumbing; the mapPartitions path is covered by ScalaTest).
  */
object MultimodalQueries {
  import graft.{QueryDef, Tables}

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_meta",
      "Binary-column plumbing: treat document text bytes as an opaque " +
        "blob; compute byte length, magic-prefix hex, and a deterministic " +
        "fake media type (decode itself is stubbed — no codecs here).",
      (s, dir) => {
        Tables.t(s, dir, "documents")
          .withColumn("blob", col("text").cast(BinaryType))
          .select(
            col("doc_id"),
            octet_length(col("text")).as("n_bytes"),
            upper(substring(hex(col("blob")), 1, 8)).as("magic_hex"),
            element_at(
              array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
              (col("doc_id") % 3 + 1).cast(IntegerType)).as("fake_media_type"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
             |  upper(substr(hex(encode(text)), 1, 8)) AS magic_hex,
             |  (['image/png','audio/wav','video/mp4'])[CAST(doc_id % 3 AS INT) + 1]
             |    AS fake_media_type
             |FROM documents ORDER BY doc_id""".stripMargin)
    )
  )
}
