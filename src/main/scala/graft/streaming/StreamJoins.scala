package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream event-time joins. The reference has no streaming join
  * surface (its ingest path is write-only; ref `src/remote_write/` and the
  * RFC scope queries to storage reads) — this is the Structured Streaming
  * shape for "enrich each event with the other stream's events in a
  * bounded lookback", the join Spark can run with BOUNDED state: an
  * equi-join on keys plus an event-time range condition, watermarked on
  * both sides so the state store evicts rows the range can no longer
  * match (left rows once the watermark passes their event time, right
  * rows once it passes `event time + lookback`). Without the time range
  * a stream-stream join would buffer both streams forever.
  */
object StreamJoins {

  /** Inner interval join: every (left, right) pair with equal `keys` and
    * `rightTime` within `[leftTime - lookbackMs, leftTime]`. Append-safe
    * (inner joins emit pairs as both sides arrive and never retract).
    *
    * Arrival later than `watermark` behind the global max event time is
    * dropped by the state store — the operator contract, same as every
    * watermarked streaming op here; replaying history in event-time order
    * (the bounded-run pattern in the sj1 oracle entry) loses nothing.
    *
    * The right side's key columns are dropped from the output (they equal
    * the left's). Time columns must be TimestampType and uniquely named
    * across the two sides — the range predicate on the raw event-time
    * columns is what Spark's analyzer turns into state-eviction bounds, so
    * this method keeps them unwrapped. */
  def intervalJoin(left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String, keys: Seq[String],
      lookbackMs: Long, watermark: String): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equi-join key")
    require(lookbackMs >= 0, s"lookbackMs must be >= 0, got $lookbackMs")
    require(leftTime != rightTime,
      s"time columns must be uniquely named, both are '$leftTime'")
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    val cond = keys.map(k => l(k) === r(k)).reduce(_ && _) &&
      r(rightTime) >= l(leftTime) - expr(s"INTERVAL $lookbackMs MILLISECONDS") &&
      r(rightTime) <= l(leftTime)
    keys.foldLeft(l.join(r, cond))((df, k) => df.drop(r(k)))
  }
}
