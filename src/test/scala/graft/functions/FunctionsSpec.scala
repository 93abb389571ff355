package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import TextFunctions._
  import VectorFunctions._

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().get(0)
  }

  test("normText lowercases, strips symbols, squeezes spaces") {
    assert(one(normText(lit("  Hello,   WORLD!! 42 "))) == "hello world 42")
    assert(one(normText(lit("!!!"))) == "")
  }

  test("charShingles: count, distinctness, short-string guard (H3)") {
    val sh = one(charShingles(lit("abcdef"), 5)).asInstanceOf[collection.Seq[String]]
    assert(sh == Seq("abcde", "bcdef"))
    assert(one(charShingles(lit("abc"), 5)).asInstanceOf[collection.Seq[String]].isEmpty)
    val rep = one(charShingles(lit("aaaaaaa"), 5)).asInstanceOf[collection.Seq[String]]
    assert(rep == Seq("aaaaa"))
  }

  test("wordNgrams produces ordered distinct n-grams") {
    val ng = one(wordNgrams(split(lit("a b c d"), " "), 3)).asInstanceOf[collection.Seq[String]]
    assert(ng == Seq("a b c", "b c d"))
    assert(one(wordNgrams(split(lit("a b"), " "), 3)).asInstanceOf[collection.Seq[String]].isEmpty)
  }

  test("jaccard: identity 1.0, disjoint 0.0") {
    val a = array(lit("x"), lit("y"))
    val b = array(lit("p"), lit("q"))
    assert(one(jaccard(a, a)) == 1.0)
    assert(one(jaccard(a, b)) == 0.0)
  }

  test("minhash signature is deterministic and monotone under containment") {
    def sig(text: String) = one(minhashSignature(
      minhashMaterial(charShingles(lit(text), 5), 12), 12))
      .asInstanceOf[collection.Seq[String]]
    val s1 = sig("the quick brown fox jumps")
    val s2 = sig("the quick brown fox jumps")
    assert(s1 == s2 && s1.size == 12)
    assert(s1.forall(_.length == 8)) // 32-bit hex slices
    // shingle superset can only lower (or keep) each min-hash component
    val sBig = sig("the quick brown fox jumps over")
    assert(s1.zip(sBig).forall { case (a, b) => b <= a })
  }

  test("dot/cosine: exact on known vectors; cosine(v,v)=1") {
    val a = array(lit(1.0), lit(2.0), lit(3.0))
    val b = array(lit(4.0), lit(-5.0), lit(6.0))
    assert(one(dot(a, b)) == 12.0)
    assert(math.abs(one(cosine(a, a)).asInstanceOf[Double] - 1.0) < 1e-12)
  }

  test("property: scalar multiple preserves cosine ~ 1 (seeded trials)") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val v = Seq.fill(8)(rnd.nextDouble() * 10 - 5)
      val k = 0.5 + rnd.nextDouble() * 3.5
      if (v.exists(x => math.abs(x) > 1e-3)) {
        val a = array(v.map(lit): _*)
        val b = array(v.map(x => lit(x * k)): _*)
        val c = one(cosine(a, b)).asInstanceOf[Double]
        assert(math.abs(c - 1.0) < 1e-9, s"v=$v k=$k cos=$c")
      }
    }
  }

  test("property: jaccard symmetric and within [0,1] (seeded trials)") {
    val rnd = new scala.util.Random(7)
    (1 to 25).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(8).toString).distinct
      val ys = Seq.fill(rnd.nextInt(6) + 1)(rnd.nextInt(8).toString).distinct
      val a = array(xs.map(lit): _*)
      val b = array(ys.map(lit): _*)
      val jab = one(jaccard(a, b)).asInstanceOf[Double]
      val jba = one(jaccard(b, a)).asInstanceOf[Double]
      assert(jab == jba && jab >= 0.0 && jab <= 1.0)
    }
  }

  test("native MinHashSignature matches the HOF/oracle formulation exactly") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark group query row data slow small filter customer line",
      "ab", // shorter than shingle width -> empty shingles -> null components
      "exact five!").toDF("text")
    val staged = docs
      .select(normText(col("text")).as("nt"))
      .select(charShingles(col("nt"), 5).as("sh"))
    val both = staged.select(
      MinHashSignature(col("sh"), 12).as("native"),
      minhashSignature(minhashMaterial(col("sh"), 12), 12).as("hof"))
      .collect()
    both.foreach { r => assert(r.get(0) == r.get(1), s"row $r") }
  }

  test("native DotProduct bit-matches the HOF fold (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(50)((Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val got = df.select(dot(col("a"), col("b")).as("native"),
      dotHof(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact, same fold order
    }
    // null array propagates to null
    val n = Seq((Option.empty[Seq[Double]], Option(Seq(1.0)))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).head()
    assert(n.isNullAt(0))
    // mis-dimensioned vectors -> null, never a truncated partial product
    val m = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).head()
    assert(m.isNullAt(0))
  }

  test("two DotProducts in one codegen unit over non-nullable arrays") {
    // regression: fixed codegen locals collided when two dots landed in the
    // same WholeStageCodegen unit (non-nullable inputs inline unbraced),
    // failing Janino and silently falling back to interpreted eval.
    import spark.implicits._
    val df = spark.range(4).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), col("id").cast("double")).as("b"),
      array(col("id").cast("double"), lit(5.0)).as("c"),
      array(lit(7.0), col("id").cast("double")).as("d"))
    val out = df.select(
      dot(col("a"), col("b")).as("ab"), dot(col("c"), col("d")).as("cd"))
      .collect()
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i * 3.0 + 2.0 * i)
      assert(r.getDouble(1) == i * 7.0 + 5.0 * i)
    }
  }

  test("native shingles/ngrams/jaccard match the HOF formulations exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val alphabet = "abc d" // tiny alphabet to force repeats -> dedup paths
    val texts = Seq.fill(40)(
      (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(5))).mkString) ++
      Seq("", "abc", "aaaaaaaaaa", "a b c d e f g")
    val df = texts.toDF("t").select(normText(col("t")).as("nt"))
      .union(Seq(Option.empty[String]).toDF("nt")) // null in -> null out, both impls
    val sh = df.select(
      charShingles(col("nt"), 5).as("native"),
      charShinglesHof(col("nt"), 5).as("hof"),
      wordNgrams(split(col("nt"), " "), 3).as("ng_native"),
      wordNgramsHof(split(col("nt"), " "), 3).as("ng_hof")).collect()
    sh.foreach { r =>
      assert(r.get(0) == r.get(1), s"shingles: $r")
      assert(r.get(2) == r.get(3), s"ngrams: $r")
    }
    // non-ASCII falls back to the slow path but stays HOF-identical
    val uni = Seq("héllo wörld déjà vu déjà", "ünïcode 文字列のテスト 文字列")
      .toDF("t")
      .select(charShingles(col("t"), 5).as("n"), charShinglesHof(col("t"), 5).as("h"))
      .collect()
    uni.foreach { r => assert(r.get(0) == r.get(1), s"unicode: $r") }
    // jaccard: pairwise vs HOF, including empty-vs-empty null semantics
    val pairs = Seq.fill(30)((
      Seq.fill(rnd.nextInt(8))(rnd.nextInt(10).toString),
      Seq.fill(rnd.nextInt(8))(rnd.nextInt(10).toString))) :+
      (Seq.empty[String], Seq.empty[String])
    val jc = pairs.toDF("a", "b").select(
      jaccard(col("a"), col("b")).as("native"),
      jaccardHof(col("a"), col("b")).as("hof")).collect()
    jc.foreach { r => assert(r.get(0) == r.get(1), s"jaccard: $r") }
  }

  test("hyperplane buckets: deterministic, scalar-positive invariant") {
    val planes = makePlanes(8, 4)
    assert(planes == makePlanes(8, 4))
    assert(planes.flatten.forall(x => x == 1.0 || x == -1.0))
    val v = array(lit(0.5), lit(-1.0), lit(2.0), lit(0.1))
    val v2 = array(lit(1.0), lit(-2.0), lit(4.0), lit(0.2)) // 2x scale
    assert(one(hyperplaneBucket(v, planes)) ==
      one(hyperplaneBucket(v2, planes)))
  }
}
