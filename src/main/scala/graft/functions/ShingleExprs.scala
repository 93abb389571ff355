package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass shingling / n-gram / Jaccard expressions (SURVEY.md §2
  * H3). Semantically identical to the HOF formulations in [[TextFunctions]]
  * (and therefore to the DuckDB oracle twins), but without the interpreted
  * per-element lambda dispatch and — critically — without the O(n²) cost of
  * `substr(s, i, k)` in a loop: UTF8String substring re-scans from the
  * string start for every position (UTF-8 is variable-width), so HOF
  * shingling of a 1 kB document costs ~1M byte scans. These run one pass.
  */

/** Distinct character k-gram shingles of a string, in first-occurrence
  * order (= `array_distinct(transform(sequence(...), substr))` with the
  * short-string guard folded in: length < k → empty array).
  *
  * Fast path: when the string is pure ASCII (numBytes == numChars — always
  * true after [[TextFunctions.normText]], which strips to `[a-z0-9 ]`),
  * shingles are zero-copy 4-byte-slice views over one stable byte array.
  * Non-ASCII falls back to per-position `substringSQL` (correct, slower).
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"shingle width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_shingles"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (s.numBytes() == nChars) { // ASCII: bytes are chars
      // getBytes returns the BACKING array (no copy) only when the string
      // spans it exactly — clone in just that case so emitted slices never
      // alias reusable memory, without double-copying the common path.
      val raw = s.getBytes
      val bytes =
        if (raw.asInstanceOf[AnyRef] eq s.getBaseObject) raw.clone() else raw
      var i = 0
      while (i <= nChars - k) {
        out.add(UTF8String.fromBytes(bytes, i, k))
        i += 1
      }
    } else {
      var i = 1
      while (i <= nChars - k + 1) {
        out.add(s.substringSQL(i, k))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  def apply(s: Column, k: Int): Column =
    GraftSqlBridge.toColumn(CharShingles(GraftSqlBridge.toExpression(s), k))
}

/** PER-POSITION character k-grams (NON-distinct) — the multinomial
  * sibling of [[CharShingles]]: element i is the gram at character
  * position i, so the output has `numChars - k + 1` elements and
  * aggregating counts over it yields the gram MULTISET a naive-Bayes
  * language model needs (the distinct set erases term frequency).
  * Same ASCII zero-copy fast path and clone-on-alias discipline.
  */
case class CharGramSeq(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1, s"gram width must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_gram_seq"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nChars = s.numChars()
    if (nChars < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - k + 1)
    if (s.numBytes() == nChars) { // ASCII: bytes are chars
      val raw = s.getBytes
      val bytes =
        if (raw.asInstanceOf[AnyRef] eq s.getBaseObject) raw.clone() else raw
      var i = 0
      while (i <= nChars - k) {
        out(i) = UTF8String.fromBytes(bytes, i, k)
        i += 1
      }
    } else {
      var i = 0
      while (i <= nChars - k) {
        out(i) = s.substringSQL(i + 1, k)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramSeq =
    copy(child = newChild)
}

object CharGramSeq {
  def apply(s: Column, k: Int): Column =
    GraftSqlBridge.toColumn(CharGramSeq(GraftSqlBridge.toExpression(s), k))
}

/** Distinct word n-grams (space-joined) over a token array, in
  * first-occurrence order; size < n → empty array. Equals the HOF
  * `array_distinct(transform(sequence(...), concat_ws(" ", element_at...)))`.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngrams"

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new java.util.LinkedHashSet[UTF8String]()
    i = 0
    val gram = new Array[UTF8String](n)
    while (i <= m - n) {
      System.arraycopy(toks, i, gram, 0, n)
      out.add(UTF8String.concatWs(space, gram: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def apply(toks: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordNgrams(GraftSqlBridge.toExpression(toks), n))
}

/** PER-POSITION word n-grams (space-joined) over a token array — the
  * NON-distinct sibling of [[WordNgrams]]: element i is the gram starting
  * at token i, so the output has exactly `size - n + 1` elements (empty
  * when size < n) and `posexplode` over it yields (position, gram) pairs.
  * The span-scrub operator needs positions (WHERE a duplicated span sits,
  * not just whether the doc has it), which the distinct set erases.
  * Equals the HOF `transform(sequence(...), concat_ws(" ", element_at...))`
  * without the interpreted per-element dispatch.
  */
case class WordNgramSeq(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_ngram_seq"

  @transient private lazy val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](m - n + 1)
    val gram = new Array[UTF8String](n)
    i = 0
    while (i <= m - n) {
      System.arraycopy(toks, i, gram, 0, n)
      out(i) = UTF8String.concatWs(space, gram: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramSeq =
    copy(child = newChild)
}

object WordNgramSeq {
  def apply(toks: Column, n: Int): Column =
    GraftSqlBridge.toColumn(WordNgramSeq(GraftSqlBridge.toExpression(toks), n))
}

/** Span-scrub rewrite kernel: given a token array and the SORTED (ascending)
  * 0-based start positions of width-`n` spans to remove, return the tokens
  * NOT covered by any [s, s+n-1] interval, in order. One pointer pass over
  * (tokens ++ starts) — O(m + |starts|) whatever the coverage pattern, where
  * the HOF formulation ([[TextFunctions.scrubTokensHof]], the differential
  * reference) pays O(m·|starts|) in interpreted lambda dispatch. Sortedness
  * is the caller's contract (`sort_array(collect_list(pos))` at the one call
  * site); an unsorted starts array silently under-removes.
  *
  * An empty starts array returns the tokens unchanged (copied — emitted
  * strings never alias the input buffer, the [[CharShingles]] aliasing
  * lesson).
  */
case class ScrubTokens(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with CodegenFallback {
  require(n >= 1, s"span width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = left.dataType
  override def prettyName: String = "graft_scrub_tokens"

  override def nullSafeEval(t: Any, s: Any): Any = {
    val toks = t.asInstanceOf[ArrayData]
    val starts = s.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val k = starts.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var idx = 0
    var coverEnd = -1L
    var p = 0
    while (p < m) {
      while (idx < k && starts.getInt(idx) <= p) {
        val e = starts.getInt(idx).toLong + (n - 1)
        if (e > coverEnd) coverEnd = e
        idx += 1
      }
      if (p > coverEnd)
        out += (if (toks.isNullAt(p)) null else toks.getUTF8String(p).clone())
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScrubTokens =
    copy(left = newLeft, right = newRight)
}

object ScrubTokens {
  def apply(toks: Column, starts: Column, n: Int): Column =
    GraftSqlBridge.toColumn(ScrubTokens(
      GraftSqlBridge.toExpression(toks), GraftSqlBridge.toExpression(starts), n))
}

/** Exact Jaccard similarity |A∩B| / |A∪B| of two string arrays in one
  * hash-set pass — replaces `size(array_intersect(a,b)) /
  * size(array_distinct(concat(a,b)))`, which allocates the concatenated
  * array plus two intermediate sets per pair. Duplicate elements are
  * deduped and a null element counts as one set member (exactly the HOF
  * form's array_intersect/array_distinct semantics); an empty union
  * yields NULL (the try_divide 0/0 convention).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard"

  // (set of non-null elements, sawNull) — null is one distinct member,
  // as array_intersect/array_distinct treat it.
  private def toSet(a: ArrayData): (java.util.HashSet[UTF8String], Boolean) = {
    val s = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var sawNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) sawNull = true else s.add(a.getUTF8String(i))
      i += 1
    }
    (s, sawNull)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (sa, nullA) = toSet(a.asInstanceOf[ArrayData])
    val (sb, nullB) = toSet(b.asInstanceOf[ArrayData])
    var inter = if (nullA && nullB) 1 else 0
    val it = (if (sa.size <= sb.size) sa else sb).iterator()
    val other = if (sa.size <= sb.size) sb else sa
    while (it.hasNext) if (other.contains(it.next())) inter += 1
    val union = sa.size + (if (nullA) 1 else 0) +
      sb.size + (if (nullB) 1 else 0) - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(JaccardSim(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
