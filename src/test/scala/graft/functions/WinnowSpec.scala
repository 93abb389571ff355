package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[WinnowFingerprints]] — the O(L) monotonic-deque winnow must be
  * bit-identical to a direct O(L·W) reference (the oracle-SQL
  * formulation: md5 per gram position, lexicographic min per sliding
  * window, distinct), and must honor the winnowing guarantee.
  */
class WinnowSpec extends SparkSpec {

  private val Gram = 4
  private val Window = 5

  private def eval(text: String, gram: Int = Gram, window: Int = Window)
      : Set[String] = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(WinnowFingerprints(col("t"), gram, window).as("r"))
      .head().getSeq[String](0).toSet
  }

  /** Straight-line reference: exactly the DuckDB oracle's
    * list_min-over-slices formulation (code-point substrings, lowercase
    * md5 hex, lexicographic min, distinct).
    */
  private def reference(text: String, gram: Int, window: Int): Set[String] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val cps = text.codePoints().toArray
    val le = cps.length - (gram - 1)
    if (le < window) return Set.empty
    val hs = (0 until le).map { i =>
      val sub = new String(cps, i, gram)
      md.reset()
      md.digest(sub.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    (window to le).map(j => hs.slice(j - window, j).min).toSet
  }

  test("matches the O(L*W) reference on random ASCII docs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val len = Window + Gram - 1 + rnd.nextInt(120)
      // small alphabet forces repeated grams => deque tie paths exercised
      val text = Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString
      assert(eval(text) == reference(text, Gram, Window), s"doc=$text")
    }
  }

  test("matches the reference on non-ASCII (code-point substrings)") {
    val text = "héllo wörld déjà vu — über naïve café crème brûlée ok"
    assert(eval(text) == reference(text, Gram, Window))
  }

  test("short docs (le < window) yield an empty set, not an error") {
    assert(eval("ab") == Set.empty)
    assert(eval("a" * (Window + Gram - 2)) == Set.empty) // le = window-1
    assert(eval("a" * (Window + Gram - 1)).nonEmpty)     // le = window
  }

  test("winnowing guarantee: shared run >= window+gram-1 chars => shared fp") {
    val rnd = new scala.util.Random(7)
    def randDoc(n: Int) =
      Array.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val shared = randDoc(Window + Gram - 1) // exactly the guarantee length
    for (_ <- 1 to 10) {
      val a = randDoc(30) + shared + randDoc(25)
      val b = randDoc(17) + shared + randDoc(40)
      assert(eval(a).intersect(eval(b)).nonEmpty,
        s"guarantee violated for shared=$shared")
    }
  }

  test("distinct: repeated content does not duplicate fingerprints") {
    val fps = eval("abcabcabcabcabcabcabcabc")
    assert(fps.size == fps.toSeq.distinct.size)
  }

  test("registered as SQL function graft_winnow") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      s"SELECT graft_winnow('the quick brown fox jumps', $Gram, $Window) r")
      .head().getSeq[String](0).toSet
    assert(r == reference("the quick brown fox jumps", Gram, Window))
  }
}
