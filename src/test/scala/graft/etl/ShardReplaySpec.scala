package graft.etl

import graft.SparkSpec
import graft.ops.SampleQueries
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Shard-major materialization (r10 verdict #3): the written file groups
  * must REPLAY the exact global training permutation when a loader walks
  * shard dirs 0..15 and streams each dir's files in listing order — no
  * read-time sort. Proven against the naive oracle (one global ORDER BY
  * on the permutation key), including the multi-file-per-shard case
  * where range boundaries land mid-shard.
  */
class ShardReplaySpec extends SparkSpec {
  import spark.implicits._

  private lazy val (docsDir, expectedOrder): (String, Seq[Long]) = {
    val d = Files.createTempDirectory("shardspec").toString
    val docs = (1L to 300L).map(id => (id, s"text of doc $id", "en", "s0", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$d/documents.parquet")
    // the naive oracle: one global sort on (md5 key, doc_id)
    val exp = docs
      .withColumn("key", md5(col("doc_id").cast("string")))
      .orderBy("key", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    (d, exp)
  }

  /** Loader emulation: shard dirs in numeric order, files per dir in
    * lexicographic name order, rows per file in physical order.
    */
  private def replay(path: String): Seq[Long] = {
    val root = new java.io.File(path)
    val shardDirs = root.listFiles().filter(_.getName.startsWith("shard="))
      .sortBy(_.getName.stripPrefix("shard=").toInt)
    shardDirs.toSeq.flatMap { dir =>
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).toSeq
        .flatMap { f =>
          spark.read.parquet(f.toString)
            .select("doc_id").as[Long].collect().toSeq
        }
    }
  }

  test("one file per shard: listing-order read == global permutation") {
    val out = s"$docsDir/shards16.parquet"
    Layout.writeShardMajor(
      SampleQueries.shuffleShardPerm(
        spark.read.parquet(s"$docsDir/documents.parquet")), out, 16)
    assert(replay(out) == expectedOrder)
  }

  test("many files (range splits mid-shard): replay still exact") {
    val out = s"$docsDir/shards48.parquet"
    Layout.writeShardMajor(
      SampleQueries.shuffleShardPerm(
        spark.read.parquet(s"$docsDir/documents.parquet")), out, 48)
    // with 48 ranges over 16 shards, several dirs MUST hold >1 file
    val root = new java.io.File(out)
    val filesPerDir = root.listFiles().filter(_.getName.startsWith("shard="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(filesPerDir.exists(_ > 1), "test should exercise multi-file dirs")
    assert(replay(out) == expectedOrder)
  }

  test("artifact phase writes the shard layout with a report row") {
    val r = Pipeline.artifactPhase(spark, docsDir,
      Pipeline.ArtifactConfig(shuffleShardTables = Seq("documents")))
    assert(r.size == 1 && r.head.kind == "shuffle_shard")
    assert(r.head.detail.contains("rows=300"))
    assert(replay(s"$docsDir/documents_shards.parquet") == expectedOrder)
  }
}
