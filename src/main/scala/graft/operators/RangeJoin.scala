package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-interval range join — all ordered pairs of rows sharing an
  * equi-key whose event times lie within `delta` of each other, the
  * time-series companion of [[AsOfJoin]] Spark also lacks as a built-in.
  *
  * A naive `a.join(b, |ta - tb| <= delta)` theta join plans as a broadcast
  * nested loop (all pairs per key) — the scale error. Instead, bucketize
  * time into `delta`-wide buckets and explode the LEFT side to its bucket
  * and both neighbors: every qualifying pair then shares the equi-join key
  * `(keys, bucket)` (the right row's single bucket is always within ±1 of
  * the left's), so Catalyst plans a plain shuffle hash join, and the exact
  * `0 <= tr - tl <= delta` filter drops false candidates. Each pair matches
  * on EXACTLY one bucket key, so no distinct pass is needed.
  *
  * Scale shape: 3 join keys per left row (constant fan-out), one shuffle
  * per side on `(keys, bucket)`; a hot `(key, bucket)` with m rows costs
  * O(m²) — inherent to the pair semantics, not the plan. */
object RangeJoin {

  /** Ordered within-`delta` pairs of `df` with itself: for every pair with
    * `0 <= r_t - l_t <= delta` (same `keys`), one row with the earlier row
    * on the left. Equal-time pairs order by `idCol` so the output is
    * deterministic and never self-pairs a row.
    *
    * @param payload extra columns carried through as `l_`/`r_` pairs
    */
  def selfWithinDelta(df: DataFrame, keys: Seq[String], timeCol: String,
      idCol: String, delta: Long, payload: Seq[String] = Nil): DataFrame = {
    require(delta > 0, s"delta must be positive, got $delta")
    val bucket: Column = floor(col(timeCol) / lit(delta)).cast("long")
    val l = df.select((keys.map(col) ++
      Seq(col(timeCol).as("l_t"), col(idCol).as("l_id")) ++
      payload.map(c => col(c).as(s"l_$c")) :+
      explode(array(bucket - 1, bucket, bucket + 1)).as("__bk__")): _*)
    val r = df.select((keys.map(col) ++
      Seq(col(timeCol).as("r_t"), col(idCol).as("r_id"), bucket.as("__bk__")) ++
      payload.map(c => col(c).as(s"r_$c"))): _*)
    l.join(r, keys :+ "__bk__")
      .filter(col("r_t") - col("l_t") <= delta &&
        (col("l_t") < col("r_t") ||
          (col("l_t") === col("r_t") && col("l_id") < col("r_id"))))
      .drop("__bk__")
  }
}
