package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the SpaceSaving sketch behind
  * q_heavy_hitters and the streaming heavy-hitter face — pure iterator
  * logic, no SparkSession. The load-bearing property is the superset
  * guarantee (Metwally et al. 2005): any item with true count > N/k is
  * among the survivors, for ANY stream order, skew, and capacity — it
  * is what makes the sketch+exact-recount pipeline exact rather than
  * approximate. Checked across random streams including orders the
  * seeded unit test cannot reach.
  */
object SketchProperties extends Properties("graft.spacesaving") {

  private val stream: Gen[(List[String], Int)] = for {
    k <- Gen.chooseNum(2, 64)
    vocab <- Gen.chooseNum(2, 300)
    n <- Gen.chooseNum(0, 2000)
    // Zipf-ish skew: id drawn as min of two uniforms concentrates mass
    items <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0, vocab - 1)
      b <- Gen.chooseNum(0, vocab - 1)
    } yield s"t${math.min(a, b)}")
  } yield (items, k)

  property("superset: every item with count > N/k survives") =
    forAll(stream) { case (items, k) =>
      val survivors = TextQueries.spaceSavingKeys(items.iterator, k).toSet
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      val n = items.size.toLong
      exact.forall { case (t, c) => c * k <= n || survivors.contains(t) }
    }

  property("capacity: never more than k survivors") =
    forAll(stream) { case (items, k) =>
      TextQueries.spaceSavingKeys(items.iterator, k).size <= k
    }

  property("small vocab: with distinct items <= k the sketch is exact") =
    forAll(stream) { case (items, k) =>
      val distinct = items.distinct.size
      distinct > k ||
        TextQueries.spaceSavingKeys(items.iterator, k).toSet == items.toSet
    }
}
