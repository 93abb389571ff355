package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the native Catalyst expressions (SURVEY.md
  * §5.3). These exercise `eval` directly with catalyst Literals — no
  * SparkSession, no jobs — so hundreds of generated cases run in
  * milliseconds; the DataFrame/codegen paths are covered separately by
  * the differential tests in FunctionsSpec.
  */
object ExprProperties extends Properties("graft.native-expressions") {

  private def strings(arr: Any): Seq[String] =
    arr.asInstanceOf[ArrayData].toObjectArray(StringType)
      .map(x => if (x == null) null else x.toString).toSeq

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 80).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'e') :+ ' ' :+ '0')).map(_.mkString))

  private val tokenArray: Gen[Seq[String]] =
    Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(4).mkString)))

  private def shingles(s: String, k: Int): Seq[String] =
    strings(CharShingles(Literal(s), k).eval(null))

  property("charShingles: distinct, width k, all substrings, exact count") =
    forAll(asciiText, Gen.chooseNum(1, 7)) { (s, k) =>
      val sh = shingles(s, k)
      val expectedCount = (0 to math.max(0, s.length - k))
        .map(i => s.substring(i, math.min(i + k, s.length)))
        .filter(_.length == k).distinct.size
      sh.distinct == sh &&
        sh.forall(_.length == k) &&
        sh.forall(s.contains(_)) &&
        sh.size == expectedCount
    }

  property("charShingles: first-occurrence order") =
    forAll(asciiText) { s =>
      val sh = shingles(s, 3)
      val firstIdx = sh.map(g => s.indexOf(g))
      firstIdx == firstIdx.sorted
    }

  property("charGramSeq: exactly the gram at every position, in order") =
    forAll(asciiText, Gen.chooseNum(1, 7)) { (s, k) =>
      val got = strings(CharGramSeq(Literal(s), k).eval(null))
      val exp = (0 to s.length - k).map(i => s.substring(i, i + k))
      got == exp
    }

  property("scrubTokens: removes exactly the covered positions") =
    forAll(tokenArray, Gen.chooseNum(1, 4)) { (toks, n) =>
      val startGen =
        if (toks.size < n) Gen.const(Seq.empty[Int])
        else Gen.listOf(Gen.chooseNum(0, toks.size - n)).map(_.sorted)
      forAll(startGen) { starts =>
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          starts.toArray[Any])
        val got = strings(ScrubTokens(
          Literal(new org.apache.spark.sql.catalyst.util.GenericArrayData(
            toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)
              .toArray[Any]),
            ArrayType(StringType)),
          Literal(arr, ArrayType(org.apache.spark.sql.types.IntegerType)),
          n).eval(null))
        val covered = starts.flatMap(s => s until s + n).toSet
        got == toks.zipWithIndex.collect {
          case (t, i) if !covered(i) => t
        }
      }
    }

  property("wordNgramSeq: gram i = tokens i..i+n-1, exact count, order") =
    forAll(tokenArray, Gen.chooseNum(1, 4)) { (toks, n) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)
          .toArray[Any])
      val got = strings(WordNgramSeq(
        Literal(arr, ArrayType(StringType)), n).eval(null))
      val exp = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
      got == exp
    }

  property("wordNgrams: each gram = n consecutive tokens") =
    forAll(tokenArray, Gen.chooseNum(1, 4)) { (toks, n) =>
      val out = strings(WordNgrams(
        Literal.create(toks, ArrayType(StringType)), n).eval(null))
      val expected = toks.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct
      out == expected
    }

  property("jaccard: symmetric, in [0,1], identity 1, disjoint 0") =
    forAll(tokenArray, tokenArray) { (a, b) =>
      def j(x: Seq[String], y: Seq[String]): Option[Double] =
        Option(JaccardSim(
          Literal.create(x, ArrayType(StringType)),
          Literal.create(y, ArrayType(StringType))).eval(null))
          .map(_.asInstanceOf[Double])
      val jab = j(a, b); val jba = j(b, a)
      val sym = jab == jba
      val bounded = jab.forall(v => v >= 0.0 && v <= 1.0)
      val ident = a.isEmpty || j(a, a).contains(1.0)
      val disjoint = {
        // "0" prefix is outside a's all-lowercase alphabet, so bb can
        // never collide with a (a "zz"-style prefix could: a may itself
        // contain "zz"+token)
        val bb = b.map("0" + _)
        b.isEmpty || a.isEmpty || j(a, bb).contains(0.0)
      }
      sym && bounded && ident && disjoint
    }

  property("minhash: component-wise monotone under shingle superset") =
    forAll(asciiText, asciiText) { (s1, s2) =>
      def sig(sh: Seq[String]): Seq[String] =
        strings(MinHashSignature(
          Literal.create(sh, ArrayType(StringType)), 8).eval(null))
      val a = shingles(s1, 3)
      val ab = (a ++ shingles(s2, 3)).distinct
      val sa = sig(a); val sab = sig(ab)
      // min over a superset can only stay equal or decrease (null = empty)
      sa.zip(sab).forall {
        case (null, null) => true
        case (null, _)    => true // empty -> null; superset may fill it
        case (_, null)    => false
        case (x, y)       => y <= x
      }
    }

  property("dot: bit-equal to a strict left-to-right fold") =
    forAll(Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0)),
      Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))) { (a, b) =>
      val got = DotProduct(
        Literal.create(a, ArrayType(DoubleType)),
        Literal.create(b, ArrayType(DoubleType))).eval(null)
        .asInstanceOf[Double]
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      Prop(java.lang.Double.compare(got, expected) == 0)
    }
}
