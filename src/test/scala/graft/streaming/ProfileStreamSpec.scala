package graft.streaming

import graft.SparkSpec
import graft.etl.Profiler
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Streaming profile maintenance — the ingest lifecycle of C5: a
  * `foreachBatch` sink folds each arriving micro-batch's single-pass
  * profile into the running TableProfile via `Profiler.merge`, and the
  * result equals profiling the whole stream's data at rest (the
  * semilattice law the oracle-checked `q_profile_merge` proves at two
  * snapshots, here exercised across MANY batches in arrival order —
  * the shape a production pipeline runs nightly per ingested batch
  * without ever rescanning the standing table).
  */
class ProfileStreamSpec extends SparkSpec {

  test("foreachBatch profile maintenance equals the at-rest profile " +
    "after any number of batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    @volatile var running: Option[graft.etl.TableProfile] = None
    val q = input.toDF().toDF("id", "name", "score")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-ckpt-prof").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val p = Profiler.profile(batch)
        running = Some(running.fold(p)(Profiler.merge(_, p)))
      }
      .start()
    val batches = Seq(
      Seq((1L, "alpha", 10L), (2L, "bee", -3L)),
      Seq((3L, "a-much-longer-name", 99L)),
      Seq((4L, "z", 0L), (5L, "mid", 42L), (6L, "q", -17L)))
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = running.get
      val atRest = Profiler.profile(
        batches.flatten.toDF("id", "name", "score"))
      assert(got == atRest,
        s"maintained profile drifted from at-rest:\n$got\nvs\n$atRest")
      // and the load-bearing stats are what a migration would read
      assert(got.rowCount == 6 && got("name").maxLength.contains(18) &&
        got("score").minNumeric.contains(-17.0) &&
        got("score").maxNumeric.contains(99.0))
    } finally q.stop()
  }
}
