package graft.ops

import java.util.regex.Pattern
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the PII/blocklist scrub pattern — pure
  * regex, no SparkSession. The load-bearing property is idempotence: a
  * redaction pass must not manufacture new matches out of replacement
  * text + surrounding context, or a re-run (streaming retry, backfill
  * over already-curated data) would mangle documents.
  */
object CorpusProperties extends Properties("graft.corpus-scrub") {

  private val p = Pattern.compile(CorpusQueries.piiPattern)

  private def scrub(s: String): String = p.matcher(s).replaceAll("[PII]")
  private def nMatches(s: String): Int = {
    val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
  }

  // fragments that exercise every pattern arm plus near-miss shapes
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.oneOf("customer", "vector", "the", "quick", "data", "a"),
    Gen.oneOf("bob@example.com", "a.b-c@mail.co", "x@y", "@@nope", "foo@bar."),
    Gen.oneOf("555-867-5309", "555 123 4567", "12-34-56", "555-8675309"),
    Gen.oneOf(".", ",", "customers", "vectors", "accustomed"))

  private val text: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, fragment).map(_.mkString(" ")))

  property("scrub is idempotent (no matches survive or appear)") =
    forAll(text) { s => nMatches(scrub(s)) == 0 }

  property("scrub only fires when a match exists") =
    forAll(text) { s => (nMatches(s) == 0) == (scrub(s) == s) }

  property("word-boundary blocklist: superstrings are untouched") =
    forAll(Gen.oneOf("customers", "accustomed", "vectors", "bivector")) {
      w => nMatches(w) == 0
    }
}
