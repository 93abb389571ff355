package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval / range-join decomposition (SURVEY.md §2-G joins; SCALE.md).
  *
  * Spark executes a pure non-equi join (`a.t BETWEEN b.t - w AND b.t + w`)
  * as a broadcast-nested-loop or cartesian product — O(n·m) compares, which
  * is the operator that dies first at 100 TB. The standard fix is bucket
  * decomposition: quantize the range attribute into width-`w` buckets so
  * that every qualifying pair shares a (key, bucket) cell, turn the range
  * predicate into a bucket equi-join (one side probes its neighbor buckets
  * too), and re-apply the exact predicate as a cheap post-filter. The plan
  * becomes a plain shuffle/sort-merge equi-join: O(n+m) shuffle, no
  * replication of either side beyond the fixed 3x bucket fan-out.
  */
object RangeJoin {

  /** All unordered pairs of rows sharing `key` whose `time` values lie
    * within `window` of each other (`|t_a - t_b| <= window`), emitted once
    * each (`id_a < id_b`). `time` must be a non-negative integral column
    * (epoch seconds); bucket width = `window`, so a qualifying pair is
    * always in the same or adjacent buckets. The probe side expands to
    * exactly 3 distinct buckets, so each pair matches exactly once — no
    * dedup pass needed.
    */
  def selfPairsWithin(df: DataFrame, key: String, time: String, id: String,
                      window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val a = df.select(col(key), col(id).as("id_a"), col(time).as("t_a"))
      .withColumn("_bk", expr(s"t_a div $window"))
    // integer `div`, not `/`: double division of epoch-scale longs can land
    // on x.99999... and floor into the wrong bucket
    val bb = expr(s"t_b div $window")
    val b = df.select(col(key), col(id).as("id_b"), col(time).as("t_b"))
      .withColumn("_bk", explode(array(bb - 1, bb, bb + 1)))
    a.join(b, Seq(key, "_bk"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_a") - col("t_b")) <= window)
      .withColumn("gap", abs(col("t_a") - col("t_b")))
      .drop("_bk", "t_a", "t_b")
  }
}
