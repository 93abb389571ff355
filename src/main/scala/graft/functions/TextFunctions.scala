package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators (SURVEY.md
  * §2 H3/H4). Everything here is built-in higher-order functions — fully
  * codegen-friendly, no UDFs — and each has an exact DuckDB twin so the
  * declared queries stay oracle-checkable:
  *
  *   Spark                                DuckDB
  *   ----------------------------------   -------------------------------
  *   regexp_replace(lower(c),p," ")       regexp_replace(lower(c),p,' ','g')
  *   split(c," ")                         string_split(c,' ')
  *   transform(sequence(..), i->substr)   list_transform(range(..), i->substr)
  *   array_min(transform(..md5..))        list_aggregate(list_transform,'min')
  *
  * The portable hash family is md5 (present and identical in both engines);
  * k independent hash functions are derived as md5(s || ":" || x) for seed
  * s — lexicographic min over fixed-width hex prefixes is order-isomorphic
  * to numeric min over the corresponding 64-bit values.
  */
object TextFunctions {

  /** DuckDB twin of [[normText]] / [[tokens]] — ONE definition so the
    * oracle strings cannot drift across query modules (TextQueries,
    * CorpusQueries, DedupQueries all embed these in their SQL).
    */
  private[graft] val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
  private[graft] val toksSql: String = s"string_split($normSql,' ')"

  /** Lowercase, strip non-alphanumerics, squeeze spaces, trim. */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens of normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Distinct character k-gram shingles of an (already normalized) string —
    * native one-pass expression ([[CharShingles]]). The HOF formulation is
    * O(len²) (substr rescans from the string start per position) and is
    * kept only as the differential-test reference ([[charShinglesHof]]).
    */
  def charShingles(c: Column, k: Int): Column = CharShingles(c, k)

  /** HOF reference for [[charShingles]]. Guarded: Spark's sequence(1, n)
    * DESCENDS for n<1, so short strings must yield an empty array
    * explicitly.
    */
  def charShinglesHof(c: Column, k: Int): Column =
    when(c.isNull, lit(null).cast("array<string>")) // null in -> null out
      .when(length(c) >= k,
        array_distinct(transform(
          sequence(lit(1), length(c) - (k - 1)),
          i => c.substr(i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct word n-grams over a token array — native ([[WordNgrams]]). */
  def wordNgrams(toks: Column, n: Int): Column = WordNgrams(toks, n)

  /** HOF reference for [[wordNgrams]]. */
  def wordNgramsHof(toks: Column, n: Int): Column =
    when(toks.isNull, lit(null).cast("array<string>")) // null in -> null out
      .when(size(toks) >= n,
        array_distinct(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** Per-shingle hash material for a MinHash family of `numHashes`
    * components: ceil(n/4) seeded md5s concatenated (each md5 yields four
    * independent 8-hex-char = 32-bit slices). One md5 per 4 hash functions
    * instead of one md5 per hash function.
    *
    * IMPORTANT (perf): pass a MATERIALIZED column (a plain attribute) for
    * `shingles`, not a composed expression — higher-order functions are
    * interpreted, so a composed argument would be re-evaluated per element.
    */
  def minhashMaterial(shingles: Column, numHashes: Int): Column = {
    val nMd5 = (numHashes + 3) / 4
    transform(shingles, x =>
      concat((0 until nMd5).map(s => md5(concat(lit(s"$s:"), x))): _*))
  }

  /** MinHash signature component i from the material column: min over the
    * i-th 8-hex-char slice. DuckDB twin:
    * list_aggregate(list_transform(hs, h -> substr(h,1+8*i,8)),'min')
    */
  def minhashComponent(material: Column, i: Int): Column =
    array_min(transform(material, h => substring(h, 1 + 8 * i, 8)))

  /** Full MinHash signature (array of `numHashes` 32-bit hex slices) from a
    * materialized [[minhashMaterial]] column.
    */
  def minhashSignature(material: Column, numHashes: Int): Column =
    array((0 until numHashes).map(minhashComponent(material, _)): _*)

  /** Per-position word n-grams (non-distinct) — native ([[WordNgramSeq]]). */
  def wordNgramSeq(toks: Column, n: Int): Column = WordNgramSeq(toks, n)

  /** HOF reference for [[wordNgramSeq]]. */
  def wordNgramSeqHof(toks: Column, n: Int): Column =
    when(toks.isNull, lit(null).cast("array<string>")) // null in -> null out
      .when(size(toks) >= n,
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Remove width-`n` spans: tokens not covered by any [s, s+n-1] for s in
    * `starts` (sorted, 0-based) — native one-pointer pass ([[ScrubTokens]]).
    */
  def scrubTokens(toks: Column, starts: Column, n: Int): Column =
    ScrubTokens(toks, starts, n)

  /** HOF reference for [[scrubTokens]] — O(m·|starts|) exists-scan, kept for
    * the differential spec only.
    */
  def scrubTokensHof(toks: Column, starts: Column, n: Int): Column =
    // sequence(0, -1) DESCENDS for empty input -> guard explicitly
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(
        filter(sequence(lit(0), size(toks) - 1),
          p => !exists(starts, s => s <= p && p <= s + (n - 1))),
        p => element_at(toks, p + 1)))

  /** Exact Jaccard similarity of two string arrays — native one-hash-set
    * pass ([[JaccardSim]]); set semantics, NULL on empty union.
    */
  def jaccard(a: Column, b: Column): Column = JaccardSim(a, b)

  /** HOF reference for [[jaccard]]: a single deterministic double division
    * of integer set sizes (try_divide: NULL on empty union — Spark 4 ANSI
    * mode would otherwise throw DIVIDE_BY_ZERO).
    */
  def jaccardHof(a: Column, b: Column): Column =
    try_divide(size(array_intersect(a, b)).cast("double"),
      size(array_distinct(concat(a, b))))
}
