package graft.storage

import org.apache.spark.sql.Column

/** File-level zone maps: per-SST column min/max recorded in the manifest at
  * write time (lifted from the parquet footer — metadata-only, no extra
  * scan), consulted at planning time to drop whole files before any task is
  * scheduled. The same idea as the manifest's time-range pruning
  * ([[Manifest.findSsts]], the reference's find_ssts), generalized to any
  * stats-bearing column — what parquet row-group stats do WITHIN a file,
  * done ACROSS files, where it saves scheduling + open + footer I/O per
  * skipped SST. At 10^6 SSTs this is the difference between "every query
  * touches every file" and "a pk-range query touches its files".
  *
  * Extraction is deliberately conservative: only top-level
  * `col <op> literal` conjuncts (and their reversals) prune — see
  * [[org.apache.spark.sql.GraftShims.comparisonBounds]]; anything else —
  * disjunctions, expressions over columns, UDFs — is ignored and the file
  * is read (the predicate still filters rows). Pruning can therefore never
  * change results, only skip files no row of which can match.
  */
object ZoneMaps {

  /** One extracted conjunct: column, comparison op (one of `< <= > >= =`),
    * literal value (Long | Double | String | Boolean). */
  final case class Bound(column: String, op: String, value: Any)

  /** Prunable bounds of a user predicate Column. */
  def bounds(p: Column): Seq[Bound] =
    org.apache.spark.sql.GraftShims.comparisonBounds(p)
      .map { case (c, op, v) => Bound(c, op, v) }

  /** Compare two stat/literal values of compatible kinds; None when the
    * kinds don't line up (pruning abstains). Numeric kinds compare as
    * double — exact enough for pruning: a boundary ULP can only RETAIN an
    * extra file, never skip a matching one, because stats are themselves
    * conservative bounds. */
  private def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Double) => dcmp(x.toDouble, y)
    case (x: Double, y: Long) => dcmp(x, y.toDouble)
    case (x: Double, y: Double) => dcmp(x, y)
    case (x: String, y: String) => Some(utf8Compare(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Floating comparisons must follow SPARK SQL equality, not IEEE total
    * order, or pruning turns unsound: Spark treats NaN = NaN and
    * -0.0 = 0.0 as TRUE, while parquet stats EXCLUDE NaN and
    * Double.compare orders -0.0 < 0.0 — a `col === NaN` literal (or an
    * all--0.0 file probed with `=== 0.0`) would wrongly skip files whose
    * rows match. NaN on either side abstains; signed zeros normalize. */
  private def dcmp(x: Double, y: Double): Option[Int] =
    if (x.isNaN || y.isNaN) None
    else Some(java.lang.Double.compare(x + 0.0, y + 0.0))

  /** Unsigned UTF-8 byte comparison — the order Spark's UTF8String uses for
    * string predicates AND the order parquet's UTF8 column statistics are
    * computed in. `String.compareTo` (UTF-16 code units) disagrees with it
    * for supplementary-plane characters (emoji sort BELOW U+E000..U+FFFF in
    * UTF-16 but ABOVE them in UTF-8), which would wrongly prune files. */
  private[storage] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Could any row of a file with these stats satisfy every bound? Columns
    * without stats (legacy manifests, unsupported types, all-null chunks)
    * abstain — the file is kept. */
  def mayMatch(stats: Map[String, (Any, Any)], bs: Seq[Bound]): Boolean =
    bs.forall { b =>
      stats.get(b.column) match {
        case None => true
        case Some((mn, mx)) =>
          val maxCmp = cmp(mx, b.value) // file max vs literal
          val minCmp = cmp(mn, b.value) // file min vs literal
          b.op match {
            case ">"  => maxCmp.forall(_ > 0)
            case ">=" => maxCmp.forall(_ >= 0)
            case "<"  => minCmp.forall(_ < 0)
            case "<=" => minCmp.forall(_ <= 0)
            case "="  => maxCmp.forall(_ >= 0) && minCmp.forall(_ <= 0)
            case _    => true
          }
      }
    }
}
