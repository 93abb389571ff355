package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature over a shingle array (SURVEY.md §2 H3).
  *
  * Semantically IDENTICAL to the built-in-HOF pipeline (and therefore to
  * the DuckDB oracle): component i is
  * min over shingles of substr(md5((i/4) || ":" || shingle), 1+8*(i%4), 8)
  * — i.e. ceil(n/4) seeded md5s per shingle, four 32-bit hex slices each,
  * lexicographic min per slice (= unsigned byte-wise min of the raw
  * digest slice, since fixed-width lowercase hex is order-isomorphic).
  *
  * The HOF version allocates, per shingle: 3 seed-concat strings, 3 hex
  * strings, one 96-char concat, then 12 substrings + array_min scans.
  * This expression runs one MessageDigest update per seed and tracks
  * 4-byte minima — no intermediate strings at all; hex is rendered once
  * per component at the end. ~5x on the LSH dedup hot path.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  private val nMd5 = (numHashes + 3) / 4
  @transient private lazy val seedBytes: Array[Array[Byte]] =
    (0 until nMd5).map(s => s"$s:".getBytes("UTF-8")).toArray
  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 4) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](numHashes)
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        var d = 0
        while (d < nMd5) {
          md.reset()
          md.update(seedBytes(d))
          md.update(bytes)
          val dig = md.digest()
          var k = 0
          while (k < 4) {
            val comp = d * 4 + k
            if (comp < numHashes) {
              val slice = java.util.Arrays.copyOfRange(dig, 4 * k, 4 * k + 4)
              if (mins(comp) == null || unsignedLess(slice, mins(comp)))
                mins(comp) = slice
            }
            k += 1
          }
          d += 1
        }
      }
      i += 1
    }
    val hexDigits = "0123456789abcdef"
    new GenericArrayData(mins.map { m =>
      if (m == null) null
      else {
        val sb = new java.lang.StringBuilder(8)
        m.foreach { b =>
          sb.append(hexDigits((b >> 4) & 0xf)); sb.append(hexDigits(b & 0xf))
        }
        UTF8String.fromString(sb.toString)
      }
    }.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry point. */
  def apply(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.toColumn(
      MinHashSignature(GraftSqlBridge.toExpression(shingles), numHashes))
}

/** LSH band hashes straight from the shingle array, one pass (SURVEY.md §2
  * H3): band b (0-based) is md5(sig[b*r+1] || … || sig[b*r+r]) over the
  * hex-rendered [[MinHashSignature]] components — bit-identical to the
  * `md5(concat(element_at(sig, …)…))` column formulation and to the DuckDB
  * twin `md5(sg[4*b+1]||…||sg[4*b+4])`.
  *
  * Exists because referencing a signature column k times from a later
  * projection lets CollapseProject inline the whole MinHash subtree into
  * every reference — the signature (and its md5 scan over all shingles) was
  * being recomputed once per band row. Emitting the band array directly
  * keeps the scan at exactly one evaluation per document.
  *
  * Null semantics match the HOF chain: an empty shingle set gives all-null
  * signature components, `concat(null…)` is null, `md5(null)` is null → an
  * array of `bands` nulls (posexplode still emits one row per band).
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  require(bands >= 1 && rowsPerBand >= 1)

  private val numHashes = bands * rowsPerBand

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_bands"

  @transient private lazy val sigExpr = MinHashSignature(child, numHashes)
  @transient private lazy val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef"

  override def nullSafeEval(input: Any): Any = {
    val sig = sigExpr.nullSafeEval(input).asInstanceOf[ArrayData]
    val md = digest.get()
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var anyNull = false
      val buf = new Array[Byte](8 * rowsPerBand)
      var r = 0
      while (r < rowsPerBand && !anyNull) {
        if (sig.isNullAt(b * rowsPerBand + r)) anyNull = true
        else {
          val compBytes = sig.getUTF8String(b * rowsPerBand + r).getBytes
          System.arraycopy(compBytes, 0, buf, 8 * r, 8)
        }
        r += 1
      }
      if (!anyNull) {
        md.reset()
        val dig = md.digest(buf)
        val sb = new java.lang.StringBuilder(32)
        dig.foreach { x =>
          sb.append(hexDigits((x >> 4) & 0xf)); sb.append(hexDigits(x & 0xf))
        }
        out(b) = UTF8String.fromString(sb.toString)
      }
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** Column-API entry point. */
  def apply(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.toColumn(
      MinHashBands(GraftSqlBridge.toExpression(shingles), bands, rowsPerBand))
}
