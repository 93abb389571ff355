package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}

/** SQL surface for the native expressions: registers every graft
  * Catalyst expression as a SQL function, so the library's primitives
  * compose from `spark.sql(...)` exactly like built-ins:
  *
  *   SELECT graft_jaccard(graft_char_shingles(a, 5),
  *                        graft_char_shingles(b, 5)) ...
  *
  * Two entry points, one registration table:
  *   - cluster-wide: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *     (the standard injection point — no code change in user jobs);
  *   - per-session: `GraftExtensions.registerAll(spark)` on an existing
  *     session (what the tests use).
  *
  * Width parameters (shingle k, n-gram n, band geometry) must be integer
  * LITERALS — they parameterize the expression instance itself (loop
  * bounds baked into the one-pass eval), they are not runtime columns.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.entries.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case IntegerLiteral(v) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (identifier, info, builder) rows for every native expression. */
  val entries: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => {
        arity("graft_dot", args, 2); DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_char_shingles"),
      info("graft_char_shingles",
        "graft_char_shingles(s, k) - distinct character k-gram shingles"),
      (args: Seq[Expression]) => {
        arity("graft_char_shingles", args, 2)
        CharShingles(args(0), intLit(args(1), "graft_char_shingles", "k"))
      }),
    (FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams",
        "graft_word_ngrams(tokens, n) - distinct word n-grams"),
      (args: Seq[Expression]) => {
        arity("graft_word_ngrams", args, 2)
        WordNgrams(args(0), intLit(args(1), "graft_word_ngrams", "n"))
      }),
    (FunctionIdentifier("graft_jaccard"),
      info("graft_jaccard",
        "graft_jaccard(a, b) - exact Jaccard similarity of two string sets"),
      (args: Seq[Expression]) => {
        arity("graft_jaccard", args, 2); JaccardSim(args(0), args(1))
      }),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(shingles, k) - k-slot seeded-md5 MinHash signature"),
      (args: Seq[Expression]) => {
        arity("graft_minhash", args, 2)
        MinHashSignature(args(0), intLit(args(1), "graft_minhash", "k"))
      }),
    (FunctionIdentifier("graft_minhash_bands"),
      info("graft_minhash_bands",
        "graft_minhash_bands(shingles, bands, rows) - LSH band hashes"),
      (args: Seq[Expression]) => {
        arity("graft_minhash_bands", args, 3)
        MinHashBands(args(0),
          intLit(args(1), "graft_minhash_bands", "bands"),
          intLit(args(2), "graft_minhash_bands", "rows"))
      }),

    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow",
        "graft_winnow(text, gram, window) - distinct winnowed char-gram " +
          "md5 fingerprints (Schleimer et al. 2003)"),
      (args: Seq[Expression]) => {
        arity("graft_winnow", args, 3)
        WinnowFingerprints(args(0),
          intLit(args(1), "graft_winnow", "gram"),
          intLit(args(2), "graft_winnow", "window"))
      }))

  /** Register every function on an already-running session (idempotent —
    * re-registration overwrites with an identical builder).
    */
  def registerAll(spark: SparkSession): Unit =
    entries.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, inf, builder)
    }
}
