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

/** SpaceSaving heavy-hitter candidates as a MERGEABLE Catalyst aggregate
  * (SURVEY §4's sanctioned custom-Catalyst candidate): per-task partial
  * buffers run the SAME SpaceSaving eviction step as the streaming
  * sketch ([[graft.ops.TextQueries.spaceSavingAdd]] — one definition, no
  * drift), partial buffers combine map-side, and merge uses the
  * Misra-Gries reduction (add counts pointwise, subtract the (k+1)-th
  * largest, drop non-positive) proven mergeable by Agarwal et al. 2012
  * ("Mergeable Summaries") — the error of the MERGED summary is bounded
  * by total mass, NOT by merge-tree depth.
  *
  * Superset contract (what q_heavy_hitters needs): eval returns a key
  * set containing EVERY term whose global count exceeds total/k when
  * the aggregate runs with `counters` >= 2k. Why 2k: per-task SS
  * leaves any absent term with true count <= n_task/counters; the merge
  * subtractions destroy >= (counters+1) x subtracted mass, so across
  * the whole merge tree they total <= n/(counters+1). A term with
  * count > n/k = 2n/counters therefore ends with a positive counter:
  * count - n/counters - n/(counters+1) > 0. The factor-2 margin is the
  * price of distributivity; memory stays O(counters) per buffer.
  *
  * vs the previous mapPartitions + distinct shape: candidates flow
  * through one ordinary partial/final aggregate (no Dataset object
  * boundary breaking whole-stage codegen around the scan, no separate
  * distinct), and what crosses the wire is one serialized
  * <= counters-entry buffer per map task.
  */
case class SpaceSavingAgg(
    child: Expression,
    counters: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(counters > 0, "counters must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      graft.ops.TextQueries.spaceSavingAdd(buffer, v.toString, counters)
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreachEntry { (t, c) =>
      buffer.update(t, buffer.getOrElse(t, 0L) + c)
    }
    if (buffer.size > counters) {
      // Misra-Gries reduction back to <= counters entries: subtract the
      // (counters+1)-th largest value from every counter, drop <= 0.
      val vals = buffer.values.toArray
      java.util.Arrays.sort(vals)
      val vk1 = vals(vals.length - (counters + 1))
      val keys = buffer.keysIterator.toArray
      keys.foreach { t =>
        val nv = buffer(t) - vk1
        if (nv <= 0L) buffer.remove(t) else buffer.update(t, nv)
      }
    }
    buffer
  }

  /** Sorted key array: a deterministic candidate set (order independent
    * of partitioning; the counts are estimates and deliberately NOT
    * exposed — q_heavy_hitters recounts exactly).
    */
  override def eval(buffer: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buffer.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreachEntry { (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_space_saving_keys"
}

object SpaceSavingAgg {
  /** Column builder: SpaceSaving candidate keys of `c` with the given
    * heavy-hitter threshold k (internally 2k counters — see class doc).
    */
  def candidates(c: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      SpaceSavingAgg(GraftSqlBridge.toExpression(c), 2 * k)
        .toAggregateExpression())
}
