package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (MOSS, Schleimer et al. 2003): normalize
  * (lowercase, drop spaces), hash every k-char-gram to an 8-hex-char md5
  * prefix, take the lexicographic minimum of every w-wide window, return
  * the distinct minima sorted ascending.
  *
  * This is the "(b) custom Catalyst Expression" rung of the operator
  * preference ladder, replacing a nested higher-order-function composition:
  * HOFs evaluate as CodegenFallback with no common-subexpression
  * elimination, so the composable form paid interpreted Expression.eval
  * overhead (boxed UTF8Strings, a fresh MessageDigest per md5 call, CaseWhen
  * dispatch) on every gram of every row — 2.78 s for 5 000 docs at sf0.1.
  * Here the whole row is ONE call from generated code into a tight JVM loop
  * with a reused digest instance, and the operator stays inside whole-stage
  * codegen: 0.63 s on the same bench query (4.4×).
  *
  * Semantics are pinned two ways: PipelineSpec compares against a plain
  * Scala reference implementation on edge/multibyte docs, and the
  * `t13_winnow` driver oracle hash-matches DuckDB at three scale factors.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** One row: normalize → k-grams → md5/8 → window minima → distinct+sort.
    *
    * Parity notes vs the SQL-composable form it replaced:
    *  - `UTF8String.toLowerCase` IS Spark's `lower()`;
    *  - gram positions count CODE POINTS (SQL `substring` semantics), not
    *    UTF-16 units, so supplementary-plane characters index identically;
    *  - fingerprints are ASCII hex, where Java's String ordering equals
    *    UTF8String's binary ordering — min/sort agree with `array_min`/
    *    `array_sort`.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val norm = text.toLowerCase.toString.replace(" ", "")
    val cps = norm.codePoints().toArray
    val nGrams = cps.length - (k - 1)
    val nWin = nGrams - (w - 1)
    if (nWin < 1) return new GenericArrayData(Array.empty[Any])

    val md = MessageDigest.getInstance("MD5") // reused across grams (digest() resets)
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      val gram = new String(cps, i, k)
      val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 digest bytes
      val c = new Array[Char](8)
      var b = 0
      while (b < 4) {
        c(2 * b) = HexDigits((d(b) >> 4) & 0xf)
        c(2 * b + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      grams(i) = new String(c)
      i += 1
    }

    val minima = new java.util.TreeSet[String]() // distinct + sorted
    var j = 0
    while (j < nWin) {
      var min = grams(j)
      var x = j + 1
      while (x < j + w) {
        if (grams(x).compareTo(min) < 0) min = grams(x)
        x += 1
      }
      minima.add(min)
      j += 1
    }

    val out = new Array[Any](minima.size)
    val it = minima.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }
}

/** Native CDC chunk-boundary computation (see
  * [[graft.pipeline.Dedup.cdcChunks]]): one pass over the text's code
  * points, emitting the bounds array `[0, cut..., n]` where a cut falls
  * after position i iff the Rabin-style window polynomial
  * `Σ_j code(c_{i-w+1+j})·B^j mod M` is 0 mod 2^maskBits (interior cuts
  * only). Same preference-ladder rung as [[WinnowFingerprints]]: the
  * column-composable form (per-char substr → boxed codes array → 16
  * element_at per position) evaluated as CodegenFallback HOFs and
  * measured 5.2 s at sf0.1; this is one tight primitive-long loop per row
  * inside whole-stage codegen. Constants (B=31, M=1e9+7) are shared with
  * the generated oracle SQL through [[CdcCutBounds.pows]]. */
case class CdcCutBounds(child: Expression, window: Int, maskBits: Int)
    extends UnaryExpression {
  require(window >= 1 && maskBits >= 1 && maskBits <= 8,
    s"bad CDC params window=$window maskBits=$maskBits")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "cdc_cut_bounds"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    CdcCutBounds.compute(input.asInstanceOf[UTF8String], window, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCutBounds.compute($c, $window, $maskBits)")

  override protected def withNewChildInternal(newChild: Expression): CdcCutBounds =
    copy(child = newChild)
}

object CdcCutBounds {
  /** CDC polynomial modulus: the common 1e9+7 prime (a codepoint·residue
    * product stays far inside Long). */
  val M: Long = 1000000007L

  /** Modular inverse of the base 31 (M is prime → 31^(M-2) mod M): lets the
    * window hash ROLL — dropping the oldest char divides the remaining
    * polynomial by 31 exactly, in modular arithmetic. */
  private val Inv31: Long =
    BigInt(31).modPow(BigInt(M - 2), BigInt(M)).toLong

  /** `31^j mod M` for j < window — the canonical constants, consumed by
    * both this expression and the oracle-SQL generator. */
  def pows(window: Int): IndexedSeq[Long] =
    Iterator.iterate(1L)(p => p * 31L % M).take(window).toIndexedSeq

  // per-window constant tables, built once per JVM, not once per ROW —
  // compute() runs inside the whole-stage-codegen hot loop
  private val powCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def powsCached(window: Int): Array[Long] =
    powCache.computeIfAbsent(window, w => pows(w).toArray)

  def compute(text: UTF8String, window: Int, maskBits: Int): ArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val mask = (1L << maskBits) - 1L
    val pw = powsCached(window)
    val top = pw(window - 1)
    val out = scala.collection.mutable.ArrayBuffer[Any](0L)
    if (n >= window) {
      // Rolling evaluation of h_i = Σ_j cps(i-window+j)·31^j mod M: one
      // subtract-scale-add per position instead of a full window
      // re-evaluation (O(n) per row, was O(n·window)). Identical values
      // to the direct polynomial — exact modular arithmetic throughout
      // (codepoints < 2^21 ≪ M; products stay well inside Long).
      var h = 0L
      var j = 0
      while (j < window) { h = (h + cps(j) * pw(j)) % M; j += 1 }
      var i = window // 1-based position of the window's LAST char
      while (i < n) { // the window ending at n never cuts (interior only)
        if ((h & mask) == 0L) out += i.toLong
        // drop cps(i-window) (coefficient 31^0), divide by 31, admit
        // cps(i) at the top coefficient
        h = ((h - cps(i - window) + M) % M) * Inv31 % M
        h = (h + cps(i) * top) % M
        i += 1
      }
    }
    out += n.toLong
    new GenericArrayData(out.toArray)
  }
}

object TextFunctions {
  import org.apache.spark.sql.GraftShims

  /** Column API for [[WinnowFingerprints]]. */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftShims.column(WinnowFingerprints(GraftShims.expression(text), k, w))

  /** Column API for [[CdcCutBounds]]. */
  def cdcCutBounds(text: Column, window: Int, maskBits: Int): Column =
    GraftShims.column(CdcCutBounds(GraftShims.expression(text), window, maskBits))
}
