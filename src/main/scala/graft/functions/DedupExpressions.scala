package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for seed i in [0, k), `min over tokens of
  * md5(i || '|' || token)` (lowercase hex), tokens = split on a single
  * space with trailing empties kept (SQL `split(text, ' ')` semantics).
  *
  * Replaces an explode + groupBy composition whose shuffle carried one row
  * PER TOKEN INSTANCE (millions of 32-char md5 strings for thousands of
  * docs): the signature is a per-document quantity, so it is computed here
  * in one pass over the row with zero shuffle, duplicate tokens hashed
  * once (min is idempotent), and digests compared as raw bytes (hex is
  * order-isomorphic to unsigned byte order) with one reused MessageDigest.
  * The md5 formula is unchanged, so the `d2_minhash_sig` DuckDB oracle
  * (which replays it in SQL) still hash-matches, as do all downstream LSH
  * band keys.
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[UTF8String], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

object MinhashSig {
  private val HexDigits = "0123456789abcdef".toCharArray

  /** a < b over equal-length byte arrays, unsigned lexicographic — the
    * same order as comparing their lowercase-hex encodings. */
  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  // Per-k seed-prefix tables, cached per JVM: compute() runs inside the
  // whole-stage-codegen hot loop, and the prefixes depend only on k — the
  // per-row rebuild allocated k byte arrays + k strings per document
  // (the CdcCutBounds.powsCached pattern).
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def prefixesFor(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k, kk => {
      val p = new Array[Array[Byte]](kk)
      var i = 0
      while (i < kk) {
        p(i) = (i.toString + "|").getBytes(StandardCharsets.UTF_8)
        i += 1
      }
      p
    })

  def compute(text: UTF8String, k: Int): ArrayData = {
    // SQL split(text, ' '): Java split with limit -1 (trailing "" kept);
    // a doc therefore always has >= 1 token, so mins are always populated.
    val toks = text.toString.split(" ", -1)
    val prefixes = prefixesFor(k)
    var i = 0
    val md = MessageDigest.getInstance("MD5") // digest() resets; reused
    val mins = new Array[Array[Byte]](k)
    val seen = new java.util.HashSet[String]()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) { // min over duplicates == min over distinct
        val tb = tok.getBytes(StandardCharsets.UTF_8)
        i = 0
        while (i < k) {
          md.update(prefixes(i)); md.update(tb)
          val d = md.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      val d = mins(i)
      val c = new Array[Char](32)
      var b = 0
      while (b < 16) {
        c(2 * b) = HexDigits((d(b) >> 4) & 0xf)
        c(2 * b + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(c))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native character-n-gram Jaccard similarity of two texts: distinct
  * n-grams by SQL substring semantics (code points; one truncated gram
  * when the text is shorter than n, the empty gram for an empty text),
  * |A ∩ B| / |A ∪ B| as a double; 0.0 when the sets are disjoint.
  *
  * Replaces a shape that exploded the shingles of EVERY document and
  * intersected them with two shuffling equi-joins: candidate pairs are a
  * bounded set (LSH-bucketed and star-capped upstream), so shipping the
  * two texts to the pair row and computing the overlap in one pass is
  * both cheaper and shuffle-free (the pair frame broadcasts against the
  * corpus). Gram-set semantics are pinned by a PipelineSpec property test
  * against the composable SQL form and by the `d5_ngram_jaccard` oracle.
  */
case class NgramJaccard(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ngram_jaccard"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramJaccard.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NgramJaccard.compute($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramJaccard =
    copy(left = newLeft, right = newRight)
}

object NgramJaccard {
  /** Distinct n-grams of `s` by code points — SQL
    * `transform(sequence(1, greatest(len-(n-1), 1)), i -> substr(s, i, n))`
    * then `array_distinct`: substr truncates at the end of the string, and
    * the degenerate positions of a short/empty string yield one
    * short/empty gram. */
  private[functions] def gramSet(s: String, n: Int): java.util.HashSet[String] = {
    val cps = s.codePoints().toArray
    val nG = math.max(cps.length - (n - 1), 1)
    val set = new java.util.HashSet[String](nG * 2)
    var i = 0
    while (i < nG) {
      set.add(new String(cps, i, math.min(n, cps.length - i)))
      i += 1
    }
    set
  }

  def compute(a: UTF8String, b: UTF8String, n: Int): Double = {
    val sa = gramSet(a.toString, n)
    val sb = gramSet(b.toString, n)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    if (inter == 0) 0.0
    else inter.toDouble / (sa.size + sb.size - inter)
  }
}

/** Native character-n-gram set overlap of two texts: returns the EXACT
  * integer triple `[|A ∩ B|, |A|, |B|]` (distinct n-grams, same gram
  * semantics as [[NgramJaccard]]) as `array<bigint>`.
  *
  * Jaccard divides too early for some dedup decisions: containment
  * `|A ∩ B| / |A|` catches a short document embedded verbatim inside a
  * long one (quote farms, aggregator pages), where Jaccard is diluted by
  * the long side's size. Returning the raw integers lets the caller derive
  * jaccard, either containment, or overlap coefficient from ONE gram pass
  * — and integers are exact across engines, so the division (and its
  * rounding) happens once, in the query, identically in Spark and the
  * DuckDB oracle.
  */
case class NgramOverlap(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "ngram_overlap"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    NgramOverlap.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.NgramOverlap.compute($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramOverlap =
    copy(left = newLeft, right = newRight)
}

object NgramOverlap {
  def compute(a: UTF8String, b: UTF8String, n: Int): ArrayData = {
    val sa = NgramJaccard.gramSet(a.toString, n)
    val sb = NgramJaccard.gramSet(b.toString, n)
    val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
    var inter = 0L
    val it = small.iterator()
    while (it.hasNext) if (big.contains(it.next())) inter += 1
    new GenericArrayData(Array[Any](inter, sa.size.toLong, sb.size.toLong))
  }
}

/** Native SimHash signature (16- or 64-bit) in one pass over the row.
  *
  * Bit b of the signature is the sign of the per-lane vote sum across
  * token INSTANCES (duplicates vote again — SimHash weights by frequency),
  * where token lane parity = the low bit of hex digit `b mod 32` (0-based)
  * of `md5(token)` (lanes 0–31) / `md5('1' || token)` (lanes 32–63), and
  * the bit sets iff `2·ones > n` — exactly the formula the composable
  * explode + 64-sibling-aggregate form computes (and the d4/d7/d8 DuckDB
  * oracles replay via `substr(h, j, 1) IN (odd hex)`).
  *
  * Replaces a shape that shuffled one row PER TOKEN INSTANCE carrying six
  * 60-bit conv() chunks: the signature is a per-document quantity, so it
  * is computed here with zero shuffle, each DISTINCT token hashed once
  * (instance count multiplies its vote), digest nibbles read directly
  * (no hex-string materialization).
  */
case class SimhashSig(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits == 16 || bits == 64, s"bits must be 16 or 64, got $bits")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimhashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {
  private val One = "1".getBytes(StandardCharsets.UTF_8)

  /** Parity of hex digit j (0-based) of a digest: the hex string writes
    * byte j/2's high nibble at even j, low nibble at odd j. */
  private def par(d: Array[Byte], j: Int): Int =
    (if ((j & 1) == 0) d(j >> 1) >> 4 else d(j >> 1)) & 1

  def compute(text: UTF8String, bits: Int): Long = {
    // SQL split(text, ' ') semantics: trailing empties kept, >= 1 token.
    val toks = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1, (a, b) => a + b)
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val ones = new Array[Int](bits)
    val lanes0 = math.min(bits, 32)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes(StandardCharsets.UTF_8)
      val c: Int = e.getValue
      val d0 = md.digest(tb)
      var b = 0
      while (b < lanes0) { ones(b) += c * par(d0, b); b += 1 }
      if (bits == 64) {
        md.update(One); md.update(tb)
        val d1 = md.digest()
        b = 32
        while (b < 64) { ones(b) += c * par(d1, b - 32); b += 1 }
      }
    }
    val n = toks.length
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (2L * ones(b) > n) sig |= 1L << b
      b += 1
    }
    sig
  }
}

object DedupFunctions {
  import org.apache.spark.sql.GraftShims

  /** Column API for [[MinhashSig]] — array of k lowercase-hex md5 minima. */
  def minhashSig(text: Column, numHashes: Int): Column =
    GraftShims.column(MinhashSig(GraftShims.expression(text), numHashes))

  /** Column API for [[NgramJaccard]]. */
  def ngramJaccard(a: Column, b: Column, n: Int): Column =
    GraftShims.column(NgramJaccard(GraftShims.expression(a),
      GraftShims.expression(b), n))

  /** Column API for [[NgramOverlap]] — `[intersection, |A|, |B|]` longs. */
  def ngramOverlap(a: Column, b: Column, n: Int): Column =
    GraftShims.column(NgramOverlap(GraftShims.expression(a),
      GraftShims.expression(b), n))

  /** Column API for [[SimhashSig]] — 16- or 64-bit signature as a long. */
  def simhashSig(text: Column, bits: Int): Column =
    GraftShims.column(SimhashSig(GraftShims.expression(text), bits))
}
