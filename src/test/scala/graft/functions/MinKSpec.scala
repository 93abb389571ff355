package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** MinKAgg's contract is exact distributivity: min-k over any
  * partitioning and merge-tree shape equals global sort-and-take.
  * Property-tested at the buffer level (update/merge/serde — pure
  * heap logic, no SparkSession) and at the DataFrame level
  * (repartition invariance, [[MinKSpec]]).
  */
object MinKProperties extends Properties("graft.mink") {
  import org.apache.spark.unsafe.types.UTF8String
  import MinKAgg.byteOrder

  /** The aggregate's documented order, lifted to String for oracles:
    * UTF-8-byte lexicographic (== DuckDB binary VARCHAR collation).
    * Differs from Java String order for strings mixing
    * supplementary-plane code points with U+E000..U+FFFF.
    */
  private val byteOrdStr: Ordering[String] = (a: String, b: String) =>
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private def agg(k: Int) = MinKAgg(
    org.apache.spark.sql.catalyst.expressions.Literal("x"), k)

  private def bufferOf(k: Int, xs: Seq[String]) = {
    val a = agg(k)
    val b = a.createAggregationBuffer()
    xs.foreach { s =>
      // drive the add path through merge with a 1-element buffer
      val one = a.createAggregationBuffer()
      one.enqueue(UTF8String.fromString(s))
      a.merge(b, one)
    }
    b
  }

  private def evalOf(b: scala.collection.mutable.PriorityQueue[UTF8String]) =
    b.toArray.sorted[UTF8String].map(_.toString).toSeq

  private val strGen = Gen.listOf(Gen.alphaNumStr)
  private val kGen = Gen.choose(1, 8)

  property("minKEqualsSortTake") = forAll(strGen, kGen) { (xs, k) =>
    evalOf(bufferOf(k, xs)) ==
      xs.sorted(byteOrdStr).take(math.min(k, xs.size))
  }

  property("mergeOverAnySplitEqualsUnsplit") =
    forAll(strGen, kGen, Gen.choose(0, 100)) { (xs, k, cut) =>
      val a = agg(k)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      evalOf(a.merge(bufferOf(k, l), bufferOf(k, r))) ==
        xs.sorted(byteOrdStr).take(math.min(k, xs.size))
    }

  property("serdeRoundTrips") = forAll(strGen, kGen) { (xs, k) =>
    val a = agg(k)
    val b = bufferOf(k, xs)
    evalOf(a.deserialize(a.serialize(b))) == evalOf(b)
  }

  // The r7 ADVICE case: U+E000..U+FFFF sorts AFTER supplementary-plane
  // code points in UTF-8 bytes but BEFORE them in UTF-16 code units.
  // The buffer must rank by bytes (DuckDB's binary collation), and the
  // generator guarantees the two orders actually diverge on some inputs.
  private val weirdGen = Gen.listOf(
    Gen.listOf(Gen.oneOf("a", "Z", "\uE000", "\uFFFD", "\uD83D\uDE00"))
      .map(_.mkString))

  property("utf8ByteOrderBeyondBMP") = forAll(weirdGen, kGen) { (xs, k) =>
    evalOf(bufferOf(k, xs)) ==
      xs.sorted(byteOrdStr).take(math.min(k, xs.size))
  }
}

class MinKSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("DataFrame min-k is invariant under repartitioning (exact " +
    "distributivity — what the window formulation gets by sorting, " +
    "this gets algebraically)") {
    val df = (1L to 997L).toDF("id")
      .select(col("id"), concat(md5(col("id").cast("string")), lit("|"),
        col("id").cast("string")).as("key"), (col("id") % 3).as("g"))
    val expect = df.orderBy("key").limit(7).select("key")
      .as[String].collect().toSeq.sorted
    for (parts <- Seq(1, 2, 32)) {
      val got = df.repartition(parts)
        .agg(MinKAgg.minK(col("key"), 7).as("ks"))
        .select(explode(col("ks")).as("k")).as[String].collect().toSeq
      assert(got == expect, s"parts=$parts")
    }
    // grouped: per-group min-k equals per-group sort-and-take
    val gotG = df.repartition(13)
      .groupBy("g").agg(MinKAgg.minK(col("key"), 4).as("ks"))
      .select(col("g"), explode(col("ks")).as("k"))
      .as[(Long, String)].collect().toSeq.sorted
    val expectG = df.withColumn("rk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("key")))
      .filter(col("rk") <= 4).select(col("g"), col("key"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(gotG == expectG)
  }
}
