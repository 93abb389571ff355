package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint selection (Schleimer et al. 2003, the
  * MOSS local algorithm) over CHARACTER grams — the scale path for the
  * q_dedup_substrings exact-substring profile (SURVEY.md §2 H3s'',
  * Lee et al. 2022 granularity).
  *
  * Semantically IDENTICAL to the HOF/oracle formulation: with
  * le = numChars(text) - (gram-1) gram positions, hs(i) =
  * md5(substr(text, i, gram)) for 1-based i, the result is the DISTINCT
  * set of window minima min(hs[j-window+1 .. j]) for j in window..le —
  * minima by lexicographic order of the lowercase 32-hex rendering, which
  * equals unsigned byte-wise order of the raw 16-byte digest (fixed-width
  * hex is order-isomorphic), so no hex string is materialized until a
  * value is actually selected. Docs with le < window yield an EMPTY array
  * (total function — safe under InferFiltersFromGenerate reordering).
  *
  * Why an expression and not the built-in HOFs: the two-projection HOF
  * pipeline (hs = transform(..md5..); fps = transform(windows, j ->
  * array_min(slice(hs, ...)))) is re-collapsed by CollapseProject, which
  * inlines the FULL hs subtree into every window reference — O(L·W) md5
  * calls per document instead of O(L) (measured: the sf0.01 corpus went
  * from ~2 min to sub-second). This eval is the textbook O(L) monotonic
  * deque: one md5 per gram position, amortized O(1) deque work per
  * window, hex rendered only for the ~2L/(W+1) selected values.
  */
case class WinnowFingerprints(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(gram >= 1 && window >= 1, "gram and window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Unsigned byte-wise compare == lexicographic compare of the lowercase
    * hex renderings (each byte maps monotonically to two hex chars).
    */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val le = text.numChars() - (gram - 1)
    if (le < window) return new GenericArrayData(Array.empty[Any])

    val md = digest.get()
    // ASCII fast path: bytes == chars, md5 straight off byte ranges with
    // zero per-gram allocation; general path goes through code-point
    // substringSQL (matches Spark substring == DuckDB substr semantics).
    val ascii = text.numBytes() == text.numChars()
    val bytes = if (ascii) text.getBytes else null
    val hs = new Array[Array[Byte]](le)
    var i = 0
    while (i < le) {
      md.reset()
      if (ascii) md.update(bytes, i, gram)
      else md.update(text.substringSQL(i + 1, gram).getBytes)
      hs(i) = md.digest()
      i += 1
    }

    // Monotonic deque of indices, increasing hash value front-to-back;
    // dq(head) is the argmin of the current window.
    val dq = new Array[Int](le)
    var head = 0
    var tail = 0
    val selected = new java.util.LinkedHashSet[UTF8String]
    var lastSel = -1 // last selected POSITION: skip set-ops while stable
    var j = 0
    while (j < le) {
      while (tail > head && !unsignedLess(hs(dq(tail - 1)), hs(j))) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - window) head += 1
      if (j >= window - 1 && dq(head) != lastSel) {
        selected.add(hex(hs(dq(head))))
        lastSel = dq(head)
      }
      j += 1
    }
    new GenericArrayData(
      selected.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  /** Column-API entry point. */
  def apply(text: Column, gram: Int, window: Int): Column =
    GraftSqlBridge.toColumn(
      WinnowFingerprints(GraftSqlBridge.toExpression(text), gram, window))
}
