package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Bounded order-statistics aggregate: the k SMALLEST strings of the
  * group, as a mergeable Catalyst `TypedImperativeAggregate` — the
  * second custom aggregate after [[SpaceSavingAgg]], and the stronger
  * case: min-k of a set is EXACTLY distributive (min-k(A ∪ B) =
  * min-k(min-k(A) ∪ min-k(B))), so unlike the sketch there is no
  * margin, no superset contract — the merged result is bit-identical
  * to a global sort-and-take at any partitioning and any merge-tree
  * shape.
  *
  * What it buys at scale: a deterministic hash-ordered RESERVOIR.
  * Feeding it `md5(id)`-prefixed keys makes "exactly k docs per
  * stratum, chosen by hash rank" one ordinary partial/final
  * aggregation whose map-side buffers collapse each task to <= k
  * entries BEFORE the stratum shuffle — O(k) task memory, ~k x strata
  * rows on the wire, and no window machinery at all. The window
  * formulation (`q_stratified_exact_k`) needs a WindowGroupLimit to
  * prune pre-exchange and still sorts rows inside each stratum hash
  * partition; this shape aggregates without any per-stratum sort of
  * the full input (each buffer is a <= k-entry heap) — the classic
  * trade the two declared queries make measurable against each other.
  *
  * Comparison order is UTF8String's own binary (unsigned-byte)
  * comparator — the buffer holds `UTF8String` end to end, so the order
  * is UTF-8-byte lexicographic == DuckDB's binary VARCHAR collation by
  * CONSTRUCTION, for any input (not just the ASCII hex keys the
  * declared queries feed it; Java `String` comparison would diverge on
  * strings mixing supplementary-plane code points with U+E000..U+FFFF).
  */
case class MinKAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[UTF8String]]
  with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  import MinKAgg.byteOrder

  // max-heap: head/dequeue is the LARGEST retained key — the one a
  // smaller arrival evicts.
  override def createAggregationBuffer(): mutable.PriorityQueue[UTF8String] =
    mutable.PriorityQueue.empty[UTF8String]

  private def add(buffer: mutable.PriorityQueue[UTF8String], v: UTF8String): Unit =
    if (buffer.size < k) buffer.enqueue(v)
    else if (v.compareTo(buffer.head) < 0) { buffer.dequeue(); buffer.enqueue(v) }

  override def update(buffer: mutable.PriorityQueue[UTF8String],
                      input: InternalRow): mutable.PriorityQueue[UTF8String] = {
    child.eval(input) match {
      case null =>
      // clone(): eval's UTF8String may be backed by a reused row buffer;
      // retained values must own their bytes.
      case s: UTF8String => add(buffer, s.clone())
      case other => add(buffer, UTF8String.fromString(other.toString))
    }
    buffer
  }

  override def merge(buffer: mutable.PriorityQueue[UTF8String],
                     other: mutable.PriorityQueue[UTF8String]): mutable.PriorityQueue[UTF8String] = {
    other.foreach(add(buffer, _))
    buffer
  }

  /** Ascending key array — rank i (1-based) of the stratum's hash order
    * is element i-1; `posexplode` recovers it downstream.
    */
  override def eval(buffer: mutable.PriorityQueue[UTF8String]): Any =
    new GenericArrayData(buffer.toArray.sorted[UTF8String])

  override def serialize(buffer: mutable.PriorityQueue[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val q = mutable.PriorityQueue.empty[UTF8String]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      q.enqueue(UTF8String.fromBytes(b))
      i += 1
    }
    q
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinKAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_min_k"
}

object MinKAgg {
  /** UTF8String's Comparable IS the binary unsigned-byte order. */
  private[functions] implicit val byteOrder: Ordering[UTF8String] =
    Ordering.comparatorToOrdering(java.util.Comparator.naturalOrder[UTF8String]())

  /** Column builder: ascending array of the k smallest values of `c`. */
  def minK(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      MinKAgg(GraftSqlBridge.toExpression(c), k).toAggregateExpression())
}
