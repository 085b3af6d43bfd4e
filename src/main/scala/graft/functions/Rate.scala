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
  case class RateBuf(firstTs: Long, lastTs: Long, lastValue: Double,
      increase: Double, n: Long)

  /** Streaming-friendly increase aggregator. NOTE: assumes per-group input
    * arrives in ts order within each merge unit (sorted SST scans provide
    * this); out-of-order merging falls back to summing partial increases. */
  class RateAggregator extends Aggregator[Sample, RateBuf, Double] {
    def zero: RateBuf = RateBuf(Long.MaxValue, Long.MinValue, Double.NaN, 0.0, 0L)
    def reduce(b: RateBuf, s: Sample): RateBuf = {
      val inc =
        if (b.n == 0L || s.value >= b.lastValue) (if (b.n == 0L) 0.0 else s.value - b.lastValue)
        else s.value
      RateBuf(math.min(b.firstTs, s.ts), math.max(b.lastTs, s.ts), s.value,
        b.increase + inc, b.n + 1)
    }
    def merge(a: RateBuf, b: RateBuf): RateBuf =
      if (a.n == 0) b else if (b.n == 0) a
      else RateBuf(math.min(a.firstTs, b.firstTs), math.max(a.lastTs, b.lastTs),
        if (b.lastTs >= a.lastTs) b.lastValue else a.lastValue,
        a.increase + b.increase, a.n + b.n)
    def finish(r: RateBuf): Double =
      if (r.n < 2 || r.lastTs == r.firstTs) 0.0
      else r.increase / ((r.lastTs - r.firstTs) / 1000.0)
    def bufferEncoder: Encoder[RateBuf] = Encoders.product[RateBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
