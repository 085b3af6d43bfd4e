package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row with
  * `rightTime <= leftTime` (strictly earlier with `strict = true`), matched
  * per key — the standard time-series point-in-time join Spark lacks as a
  * built-in operator.
  *
  * Implementation is union + running-window rather than a per-row probe
  * join: both sides shuffle ONCE on the key, the window scans each
  * partition sorted by time, and the "latest prior" is a running `max` over
  * a (time, payload) struct (struct ordering is by time first). O(n log n)
  * per key group, no broadcast requirement, no skew amplification — this is
  * the shape that survives 100 TB, unlike a range join which Catalyst would
  * plan as a broadcast-nested-loop.
  */
object AsOfJoin {

  /** @param left       probe side (keeps all its rows)
    * @param right      reference side providing the as-of payload
    * @param keys       equi-join key column names (present on both sides)
    * @param leftTime   event-time column on `left` (numeric/orderable)
    * @param rightTime  event-time column on `right`
    * @param payload    columns of `right` to attach (prefixed `asof_`)
    * @param strict     true = strictly-before (`<`), false = at-or-before (`<=`)
    * @param toleranceMs max staleness: a prior row older than
    *                    `leftTime - toleranceMs` is NOT attached (nulls
    *                    instead) — the standard bounded as-of variant.
    *                    Same single-shuffle plan; the bound is a per-row
    *                    predicate on the attached struct, not a range join.
    */
  def joinPrior(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      strict: Boolean = true, toleranceMs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.select(keys.map(col) ++
      Seq(lit(0).as("__side__"), col(leftTime).as("__t__")) ++
      leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")): _*)
    val r = right.select(keys.map(col) ++
      Seq(lit(1).as("__side__"), col(rightTime).as("__t__"),
        struct(col(rightTime) +: payload.map(col): _*).as("__p__")): _*)
    // unionByName null-fills each side's missing columns (__p__ / __l_*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time iff non-strict
    val sideOrder = if (strict) col("__side__").asc else col("__side__").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t__").asc, sideOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prior = unioned.withColumn("__asof__",
      max(when(col("__side__") === 1, col("__p__"))).over(w))
    val att = toleranceMs match {
      case Some(tol) => when(
        col(s"__asof__.$rightTime") >= col("__t__") - lit(tol), col("__asof__"))
      case None => col("__asof__")
    }
    prior.filter(col("__side__") === 0)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        (rightTime +: payload).map(c => att.getField(c).as(s"asof_$c")): _*)
  }
}
