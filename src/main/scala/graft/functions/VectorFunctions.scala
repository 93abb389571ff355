package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives (SURVEY.md §2 H2) as built-in higher-order
  * functions — codegen-capable, no UDF, no driver round-trips.
  *
  * Determinism: Spark's `aggregate` is a strict left-to-right fold, and
  * DuckDB's `list_dot_product` over DOUBLE[] folds identically (verified
  * empirically: bit-equal against a sequential Python sum on the actual
  * testdata), so `dot`/`cosine` here are bit-comparable with the oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`.
  */
object VectorFunctions {

  /** ArrayType(FloatType) -> ArrayType(DoubleType); float->double widening
    * is exact, after which every product/sum below is double IEEE.
    */
  def toDoubleVec(c: Column): Column = c.cast("array<double>")

  /** Sequential-fold dot product of two equal-length double arrays —
    * native codegen'd expression ([[DotProduct]]); same left-to-right
    * order as the HOF formulation and DuckDB's list_dot_product.
    */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  /** Built-in-HOF dot product (interpreted; kept as the reference
    * implementation that [[DotProduct]] is tested against).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Signed-random-projection (hyperplane LSH) bucket id: one bit per
    * plane, planes inlined as ±1.0 literal arrays (deterministic, so the
    * oracle twin embeds the identical literals). At 100 TB this replaces
    * the O(n^2) cosine cross join with an equi-join on bucket.
    */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat(planes.map { p =>
      val plane = array(p.map(lit): _*)
      // two-sided when: a NULL dot (null vector OR dimension mismatch)
      // stays NULL, and concat propagates it — a corrupt embedding gets a
      // NULL bucket (dropped by the equi-join) instead of colliding into
      // the plausible-looking all-zeros bucket.
      when(dot(vec, plane) >= 0.0, lit("1"))
        .when(dot(vec, plane) < 0.0, lit("0"))
    }: _*)

  /** Deterministic ±1 hyperplanes from a 64-bit LCG (values inlined into
    * both the Spark plan and the oracle SQL; no RNG at query time).
    */
  def makePlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    Seq.fill(numPlanes)(Seq.fill(dim)(if (next() >= 0L) 1.0 else -1.0))
  }
}
