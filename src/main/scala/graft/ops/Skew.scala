package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SCALE.md §0/§3 made concrete).
  *
  * AQE's skew-join splitting handles moderate skew automatically; manual
  * salting remains the tool when one join key is SO hot that a single
  * sort-merge/shuffle-hash partition exceeds executor memory even after
  * AQE splits, or when AQE is unavailable (e.g. inside a cached stage).
  *
  * Algebraic aggregations (sum/count/min/max) do NOT need salting in
  * Spark — partial aggregation before the shuffle already spreads a hot
  * group across all input partitions; salting only helps aggregation for
  * non-partial ops (collect_list, exact distinct), which is why only the
  * JOIN variant lives here.
  */
object Skew {

  /** Equi-join `big` (skewed) with `small` on `key`, spreading each hot
    * key across `salts` reducers: the big side gets a uniform salt, the
    * small side is replicated once per salt value, and the join runs on
    * (key, salt). Result set is IDENTICAL to `big.join(small, key)` —
    * the salt only changes row placement, so output is deterministic
    * regardless of partitioning.
    *
    * Cost model: small side shuffles `salts`x its size; big side shuffles
    * once but each hot key now lands on `salts` reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "column name _salt is reserved by saltedJoin")
    // any row->[0,salts) spread works (correctness is salt-independent);
    // hashing the key plus a physical rowid spreads a single hot key too
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
