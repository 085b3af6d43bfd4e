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
  *    bounded disjoint-time-segment state.
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
    * groupBy over the series key (and optionally a time bucket).
    * `tiebreak` closes the window ordering for series that can carry
    * DUPLICATE timestamps (ts alone would make lag() — and therefore the
    * increase — partitioning-dependent; callers with such data pass a
    * unique column, the way the event-replay oracles order by
    * (ts, event_id)). */
  def increaseOverWindow(df: DataFrame, valueCol: String, seriesKeys: Seq[String],
      tsCol: String, tiebreak: Seq[String] = Nil): DataFrame = {
    val withDelta = df.withColumn("__delta__",
      resetAwareDelta(col(valueCol), seriesKeys.map(col),
        (tsCol +: tiebreak).map(col)))
    withDelta.groupBy(seriesKeys.map(col): _*)
      .agg(sum(col("__delta__")).as("increase"),
        (max(col(tsCol)) - min(col(tsCol))).as("range_ms"),
        count(lit(1)).as("n_samples"))
      .withColumn("rate_per_sec",
        when(col("range_ms") > 0, col("increase") / (col("range_ms") / 1000.0)))
  }

  /** (ts epoch-ms, value) sample for the typed aggregator. */
  case class Sample(ts: Long, value: Double)

  /** One time-contiguous run of samples already reduced: first/last
    * sample and the reset-aware increase WITHIN the run. */
  case class Seg(firstTs: Long, firstValue: Double, lastTs: Long,
      lastValue: Double, increase: Double)
  case class RateBuf(segs: Seq[Seg], n: Long)

  /** Streaming-friendly increase aggregator. Assumes per-group input
    * arrives in ts order within each reduce unit (sorted SST scans provide
    * this). The buffer holds DISJOINT TIME SEGMENTS, never a collapsed
    * single span: collapsing two non-adjacent partials at merge time would
    * bake in a boundary delta that SPANS a partial still to come, so the
    * answer would depend on Spark's merge order (merge((P1,P3),P2) vs
    * ((P1,P2),P3)). Segments only stitch at [[finish]], where the set is
    * complete — merging is therefore associative and commutative, and the
    * boundary delta between consecutive segments is reconstructed
    * reset-aware exactly once. Segment count is bounded by the number of
    * partial buffers (partitions), with a hard cap ([[RateAggregator.MaxSegs]])
    * collapsing the closest-gap pair first (only reachable under extreme
    * fragmentation; collapse uses the same boundary arithmetic finish
    * would). Genuinely overlapping segments (out-of-order duplicates)
    * merge by summing their partial increases without a boundary — the
    * documented fallback.
    *
    * STREAMING-CHECKPOINT compatibility: the round-14 associativity fix
    * changed the buffer schema from a flat 6-field product to
    * (segs: Seq[Seg], n) — a stateful streaming query whose state store
    * holds the OLD encoding cannot restore it (state-store schema
    * mismatch on upgrade). Restart such queries from a fresh checkpoint
    * (the sinks here are replayable batch-converging lanes); if in-place
    * upgrades ever matter, version the aggregator under a new class name
    * instead of evolving the buffer. */
  class RateAggregator extends Aggregator[Sample, RateBuf, Double] {
    import RateAggregator.MaxSegs
    def zero: RateBuf = RateBuf(Nil, 0L)

    def reduce(b: RateBuf, s: Sample): RateBuf = {
      val segs = b.segs
      val out =
        if (segs.nonEmpty && s.ts >= segs.last.lastTs) {
          // in-order within the reduce unit: extend the newest segment
          val t = segs.last
          val inc = if (s.value >= t.lastValue) s.value - t.lastValue else s.value
          segs.init :+ t.copy(lastTs = s.ts, lastValue = s.value,
            increase = t.increase + inc)
        } else
          // out-of-order sample: its own 1-sample segment, stitched later
          insert(segs, Seg(s.ts, s.value, s.ts, s.value, 0.0))
      RateBuf(cap(out), b.n + 1)
    }

    def merge(a: RateBuf, b: RateBuf): RateBuf =
      RateBuf(cap(b.segs.foldLeft(a.segs)(insert)), a.n + b.n)

    /** Insert keeping segments sorted by firstTs; a segment OVERLAPPING an
      * existing one fuses with it (partial-sum fallback — no boundary). */
    private def insert(segs: Seq[Seg], s: Seg): Seq[Seg] = {
      val (before, rest) = segs.span(_.firstTs < s.firstTs)
      val merged = scala.collection.mutable.ArrayBuffer.empty[Seg]
      merged ++= before
      var cur = s
      // fuse with the previous segment if overlapping
      if (merged.nonEmpty && merged.last.lastTs > cur.firstTs) {
        val p = merged.remove(merged.length - 1)
        cur = fuse(p, cur)
      }
      var tail = rest
      while (tail.nonEmpty && cur.lastTs > tail.head.firstTs) {
        cur = fuse(cur, tail.head)
        tail = tail.tail
      }
      (merged += cur) ++= tail
      merged.toSeq
    }

    /** Overlap fallback: sum partial increases, widen the span. */
    private def fuse(x: Seg, y: Seg): Seg = {
      val (ft, fv) =
        if (x.firstTs <= y.firstTs) (x.firstTs, x.firstValue)
        else (y.firstTs, y.firstValue)
      val (lt, lv) =
        if (x.lastTs >= y.lastTs) (x.lastTs, x.lastValue)
        else (y.lastTs, y.lastValue)
      Seg(ft, fv, lt, lv, x.increase + y.increase)
    }

    /** Stitch two time-disjoint consecutive segments with the reset-aware
      * boundary delta — finish's arithmetic, also used by the cap. */
    private def stitch(lo: Seg, hi: Seg): Seg = {
      val boundary =
        if (hi.firstValue >= lo.lastValue) hi.firstValue - lo.lastValue
        else hi.firstValue
      Seg(lo.firstTs, lo.firstValue, hi.lastTs, hi.lastValue,
        lo.increase + hi.increase + boundary)
    }

    private def cap(segs: Seq[Seg]): Seq[Seg] =
      if (segs.size <= MaxSegs) segs
      else {
        // collapse the smallest-gap consecutive pair (least likely to
        // have unseen data in between)
        val i = segs.indices.init.minBy(j =>
          segs(j + 1).firstTs - segs(j).lastTs)
        (segs.take(i) :+ stitch(segs(i), segs(i + 1))) ++ segs.drop(i + 2)
      }

    def finish(r: RateBuf): Double = {
      if (r.n < 2 || r.segs.isEmpty) return 0.0
      val whole = r.segs.reduce(stitch)
      if (whole.lastTs == whole.firstTs) 0.0
      else whole.increase / ((whole.lastTs - whole.firstTs) / 1000.0)
    }
    def bufferEncoder: Encoder[RateBuf] = Encoders.product[RateBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  object RateAggregator {
    /** Buffer segment cap — far above any real partial count (Spark merges
      * one buffer per map partition); the cap only engages under extreme
      * out-of-order fragmentation. */
    val MaxSegs = 64
  }
}
