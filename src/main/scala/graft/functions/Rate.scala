package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** PromQL-shaped `rate`/`increase`/`delta` with counter-reset handling —
  * the one aggregate the reference specifies but Spark lacks
  * (reference RFC docs/rfcs/20220702-prometheus-read-extension.md:93-94,
  * "rate is an UDF in HoraeDB").
  *
  * Counter-reset semantics (Prometheus-compatible): scanning samples in time
  * order, a drop in value means the counter reset; the post-reset value
  * counts fully toward the increase.
  *
  * Two implementations:
  *  - [[increaseOverWindow]]: pure window expressions (codegen'd, no state) —
  *    preferred in batch plans, shuffles once on the series key;
  *  - [[RateAggregator]]: a typed [[Aggregator]] usable in
  *    `KeyValueGroupedDataset.agg` and streaming aggregations, carrying
  *    (firstTs, lastTs, increase) state.
  */
object Rate {

  /** Per-row positive delta with reset handling, over (series key, time
    * order): `value - lag(value)` when non-negative, else `value`. */
  def resetAwareDelta(value: Column, seriesKeys: Seq[Column], orderCols: Seq[Column]): Column = {
    val w = Window.partitionBy(seriesKeys: _*).orderBy(orderCols: _*)
    val prev = lag(value, 1).over(w)
    when(prev.isNull, lit(0.0))
      .when(value >= prev, value - prev)
      .otherwise(value) // counter reset: count the whole post-reset value
  }

  /** Total increase per series over the frame, reset-aware. Compose with a
    * groupBy over the series key (and optionally a time bucket). */
  def increaseOverWindow(df: DataFrame, valueCol: String, seriesKeys: Seq[String],
      tsCol: String): DataFrame = {
    val withDelta = df.withColumn("__delta__",
      resetAwareDelta(col(valueCol), seriesKeys.map(col), Seq(col(tsCol))))
    withDelta.groupBy(seriesKeys.map(col): _*)
      .agg(sum(col("__delta__")).as("increase"),
        (max(col(tsCol)) - min(col(tsCol))).as("range_ms"),
        count(lit(1)).as("n_samples"))
      .withColumn("rate_per_sec",
        when(col("range_ms") > 0, col("increase") / (col("range_ms") / 1000.0)))
  }

  /** (ts epoch-ms, value) sample for the typed aggregator. */
  case class Sample(ts: Long, value: Double)
  case class RateBuf(firstTs: Long, firstValue: Double, lastTs: Long,
      lastValue: Double, increase: Double, n: Long)

  /** Streaming-friendly increase aggregator. Assumes per-group input
    * arrives in ts order within each reduce unit (sorted SST scans provide
    * this). MERGING is exact for time-disjoint buffers — the normal Spark
    * partial-aggregation split of an ordered stream: the boundary delta
    * between the earlier buffer's last value and the later buffer's first
    * value is reconstructed reset-aware (without it, every partition
    * boundary silently dropped one delta and the result varied with
    * partitioning). Overlapping (genuinely out-of-order) buffers fall back
    * to summing partial increases, as documented. */
  class RateAggregator extends Aggregator[Sample, RateBuf, Double] {
    def zero: RateBuf =
      RateBuf(Long.MaxValue, Double.NaN, Long.MinValue, Double.NaN, 0.0, 0L)
    def reduce(b: RateBuf, s: Sample): RateBuf = {
      val inc =
        if (b.n == 0L || s.value >= b.lastValue) (if (b.n == 0L) 0.0 else s.value - b.lastValue)
        else s.value
      RateBuf(math.min(b.firstTs, s.ts),
        if (b.n == 0L) s.value else b.firstValue,
        math.max(b.lastTs, s.ts), s.value,
        b.increase + inc, b.n + 1)
    }
    def merge(a: RateBuf, b: RateBuf): RateBuf = {
      if (a.n == 0) return b
      if (b.n == 0) return a
      // order the two buffers by time; exact when they don't interleave
      val (lo, hi) = if (a.lastTs <= b.firstTs) (a, b)
        else if (b.lastTs <= a.firstTs) (b, a)
        else (a, b) // interleaved: boundary unknown, keep partial sum
      val boundary =
        if (lo.lastTs <= hi.firstTs) // reset-aware cross-buffer delta
          (if (hi.firstValue >= lo.lastValue) hi.firstValue - lo.lastValue
           else hi.firstValue)
        else 0.0
      RateBuf(math.min(a.firstTs, b.firstTs),
        if (a.firstTs <= b.firstTs) a.firstValue else b.firstValue,
        math.max(a.lastTs, b.lastTs),
        if (b.lastTs >= a.lastTs) b.lastValue else a.lastValue,
        a.increase + b.increase + boundary, a.n + b.n)
    }
    def finish(r: RateBuf): Double =
      if (r.n < 2 || r.lastTs == r.firstTs) 0.0
      else r.increase / ((r.lastTs - r.firstTs) / 1000.0)
    def bufferEncoder: Encoder[RateBuf] = Encoders.product[RateBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
