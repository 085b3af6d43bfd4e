package graft.metric

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile evaluation over NATIVE (exponential/sparse) histograms — the
  * query-side half of remote-write 2.0 histogram ingest (the decode half
  * is [[graft.streaming.RemoteWrite]]; storage is
  * [[MetricEngine.histogramsSchema]]).
  *
  * Semantics (documented contract, PROMQL.md "Native histograms"):
  * `histogram_quantile(φ)` ranks `φ × count` into the bucket sequence
  * ordered lowest-value-first — negative buckets (most negative first),
  * the zero bucket, then positive buckets — and interpolates LINEARLY
  * within the located bucket, the same within-bucket assumption as the
  * classic `le`-bucket `histogram_quantile`. Standard schemas (-4..8)
  * derive bounds from `base = 2^(2^-schema)`: positive bucket i covers
  * `(base^(i-1), base^i]`, negative bucket i covers
  * `[-base^i, -base^(i-1))`, the zero bucket `[-zeroThreshold,
  * zeroThreshold]` (collapsed to `[0, zt]` / `[-zt, 0]` when one sign has
  * no buckets, as Prometheus does). Schema -53 (custom bounds, "NHCB")
  * reads classic upper bounds from `custom_values`: bucket i covers
  * `(custom_values[i-1], custom_values[i]]` with bucket 0 starting at 0;
  * bucket index `size(custom_values)` is the +Inf overflow bucket (the
  * classic `le="+Inf"` bucket of an OTLP fixed-bucket histogram) — its
  * bounds clamp to the highest finite bound, so a quantile landing there
  * returns that bound, Prometheus's own convention for classic and
  * custom-bucket histograms.
  * Edge cases: `φ < 0 → -Inf`, `φ > 1 → +Inf`, `count == 0 → NaN`
  * (Prometheus's own conventions).
  *
  * Scale shape: one projection of per-row array expressions — zero
  * shuffles, zero UDFs, no driver collect. Bucket arrays are small
  * (dozens of entries), so the `aggregate()` walk is O(buckets) scalar
  * work per (series, ts, φ) row and the whole evaluation stays
  * embarrassingly parallel at any series cardinality. */
object NativeHistograms {

  /** Per-(row, φ) quantiles over histogram rows shaped like
    * [[MetricEngine.queryHistograms]] output (count/sum/bucket_schema/
    * zero_threshold/zero_count/pos_idx/pos_cnt/neg_idx/neg_cnt/
    * custom_values; any identifying columns such as series_key/ts_ms ride
    * along). Output: the input's identity columns + (phi, value). */
  def quantile(rows: DataFrame, phis: Seq[Double]): DataFrame = {
    require(phis.nonEmpty, "at least one quantile requested")
    val idCols = histIdCols(rows)
    val buckets = bucketsExpr

    // cumulative walk: first bucket whose running count reaches the rank,
    // then linear interpolation between its bounds; FP undershoot at φ=1
    // falls back to the top bucket's upper bound
    val walk =
      """aggregate(__buckets__,
        |  named_struct('cum', CAST(0.0 AS DOUBLE), 'res', CAST(NULL AS DOUBLE)),
        |  (acc, b) -> IF(acc.res IS NOT NULL, acc,
        |    IF(b.cnt > CAST(0.0 AS DOUBLE) AND acc.cum + b.cnt >= __rank__,
        |      named_struct('cum', acc.cum + b.cnt,
        |        'res', b.lo + (b.hi - b.lo) * ((__rank__ - acc.cum) / b.cnt)),
        |      named_struct('cum', acc.cum + b.cnt, 'res',
        |        CAST(NULL AS DOUBLE)))),
        |  acc -> acc.res)""".stripMargin
    rows
      .withColumn("phi", explode(array(phis.map(p => lit(p)): _*)))
      .withColumn("__rank__", col("phi") * col("count"))
      .withColumn("__buckets__", expr(buckets))
      .withColumn("value",
        when(col("count") <= 0.0, lit(Double.NaN))
          .when(col("phi") < 0.0, lit(Double.NegativeInfinity))
          .when(col("phi") > 1.0, lit(Double.PositiveInfinity))
          .otherwise(coalesce(expr(walk),
            expr("element_at(__buckets__, size(__buckets__)).hi"))))
      .select((idCols.map(MetricEngine.qcol) :+ col("phi") :+ col("value")): _*)
  }

  /** One row's (idx, cnt) arrays merged down `__d__` halvings: each
    * halving merges adjacent bucket pairs (`idx → ((idx-1) >> d) + 1`,
    * Prometheus's `reduceResolution` rule — exact for standard
    * exponential schemas: the coarser bucket's bounds are the union of
    * the pair's). Indexes arrive sorted ascending, so converted indexes
    * are nondecreasing and a single fold merges equal neighbors. O(n²)
    * array rebuilds in the worst case, but bucket arrays are dozens of
    * entries. */
  private def downscaledArrays(idxCol: String, cntCol: String): String =
    s"""IF(__d__ <= 0, named_struct('idx', $idxCol, 'cnt', $cntCol),
       |  aggregate(arrays_zip($idxCol, $cntCol),
       |    named_struct('idx', CAST(array() AS ARRAY<INT>),
       |                 'cnt', CAST(array() AS ARRAY<DOUBLE>)),
       |    (acc, z) -> IF(size(acc.idx) > 0 AND
       |        element_at(acc.idx, size(acc.idx)) =
       |          shiftright(z.$idxCol - 1, __d__) + 1,
       |      named_struct('idx', acc.idx,
       |        'cnt', concat(slice(acc.cnt, 1, size(acc.cnt) - 1),
       |          array(element_at(acc.cnt, size(acc.cnt)) + z.$cntCol))),
       |      named_struct(
       |        'idx', concat(acc.idx,
       |          array(shiftright(z.$idxCol - 1, __d__) + 1)),
       |        'cnt', concat(acc.cnt, array(z.$cntCol))))))""".stripMargin

  /** Convert every histogram row to the COARSEST standard schema present
    * in its `partitionCols` group — what Prometheus does when a
    * scrape-config change lands mid-window or a `sum by` group spans
    * targets on different schemas (exact: merging adjacent bucket pairs
    * halves the schema). NHCB (-53) cannot mix with standard schemas
    * (custom bounds are unrelated to the exponential grid) — that still
    * raises. Single-schema groups pass through bit-identical (`__d__` =
    * 0). Cost: one window min/max over `partitionCols` — the same keys
    * the callers shuffle on next, so the exchange is reused — plus
    * per-row array folds. */
  private[metric] def downscaleToCoarsest(rows: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(MetricEngine.qcol): _*)
    rows
      .withColumn("__tgt__", min(col("bucket_schema")).over(w))
      .withColumn("__mx__", max(col("bucket_schema")).over(w))
      .withColumn("__tgt__",
        when(col("__tgt__") =!= col("__mx__") && col("__tgt__") === -53,
          expr("CAST(raise_error('cannot mix custom-bound (NHCB) and " +
            "standard native histogram schemas') AS INT)"))
          .otherwise(col("__tgt__")))
      .withColumn("__d__", col("bucket_schema") - col("__tgt__"))
      .withColumn("__pos__", expr(downscaledArrays("pos_idx", "pos_cnt")))
      .withColumn("__neg__", expr(downscaledArrays("neg_idx", "neg_cnt")))
      .withColumn("pos_idx", col("__pos__.idx"))
      .withColumn("pos_cnt", col("__pos__.cnt"))
      .withColumn("neg_idx", col("__neg__.idx"))
      .withColumn("neg_cnt", col("__neg__.cnt"))
      .withColumn("bucket_schema", col("__tgt__"))
      .drop("__tgt__", "__mx__", "__d__", "__pos__", "__neg__")
  }

  /** Bucket-wise reset-aware INCREASE over a window of native histogram
    * samples — the vector behind `histogram_quantile(q, rate(m[w]))`
    * (Prometheus's own docs note the quantile of `rate` equals the
    * quantile of `increase`: every bucket divides by the same window
    * seconds, and the quantile is scale-invariant — so the increase
    * histogram IS the rate histogram for quantile purposes).
    *
    * Semantics (documented dialect): per (series, bucket), samples order
    * by time, a bucket ABSENT from a sample counts 0 (sparse encoding
    * drops empty buckets), and the increase is the sum of positive
    * deltas between consecutive samples with a drop treated as a counter
    * reset contributing the new count — the same arithmetic as the
    * engine's scalar `resetAwareDelta`, applied bucket-wise (Prometheus
    * detects whole-histogram resets; bucket-wise detection is at least
    * as sensitive on well-formed data, where a reset zeroes every
    * bucket). The zero bucket and the top-level count participate
    * identically. A schema change within the window (a scrape-config
    * change mid-flight) downscales the finer samples to the coarsest
    * schema present first — exact for standard schemas
    * ([[downscaleToCoarsest]]), Prometheus's own behavior; only NHCB
    * bound changes reject (no exact conversion).
    *
    * `bucketMs` bucketizes the increase on the tumbling step grid for
    * RANGE evaluation (deviation #1's model): deltas chain per (series,
    * bucket index) across the WHOLE input in time order, each delta
    * attributed to its LATER sample's time bucket — exactly the scalar
    * rate path's arithmetic (`p3`'s oracle shape) — and the output
    * carries a `bucket_ms` column, one increase histogram per (series,
    * time bucket). Time buckets with a single overall-first sample get
    * all-zero increases (count 0 → [[quantile]] yields NaN, which range
    * callers drop — Prometheus's "need two samples" rule).
    *
    * Input: [[MetricEngine.queryHistograms]]-shaped rows (one per
    * (series_key, ts_ms)). Output: ONE row per series_key (per time
    * bucket when `bucketMs` is set), shaped for
    * [[quantile]] — count/zero_count/pos/neg arrays hold increases,
    * ts_ms the window's newest sample time. Scale: cost is linear in the
    * PRESENT bucket entries (no dense time×bucket materialization — see
    * the absence-handling comment in the body), two keyed shuffles on
    * uniform hash keys plus one per-series rebuild. */

  def increase(rows0: DataFrame, bucketMs: Option[Long] = None): DataFrame = {
    // schema changes within the window downscale to the coarsest (per
    // series across the WHOLE input — deltas chain across time buckets,
    // so one grid must hold throughout)
    val rows = downscaleToCoarsest(rows0, Seq("series_key"))
    // the per-row meta columns ride the explode (constant per source row)
    // so the whole evaluation is ONE pass over the input: the old shape
    // re-computed the upstream scan subtree for a separate meta aggregate,
    // a distinct+lag prev-sample frame joined back, and four filtered
    // assembly branches — with AQE every exchange is its own query-stage
    // job, so a 6-sample fixture paid ~400 Exchange nodes of plan
    val entries = rows.select(col("series_key"), col("ts_ms"),
      col("bucket_schema"), col("zero_threshold"), col("custom_values"),
      explode(expr(
        """concat(
          |  array(named_struct('kind', 0, 'idx', 0, 'cnt', zero_count)),
          |  array(named_struct('kind', 2, 'idx', 0, 'cnt', count)),
          |  transform(arrays_zip(pos_idx, pos_cnt),
          |    z -> named_struct('kind', 1, 'idx', z.pos_idx, 'cnt', z.pos_cnt)),
          |  transform(arrays_zip(neg_idx, neg_cnt),
          |    z -> named_struct('kind', -1, 'idx', z.neg_idx, 'cnt', z.neg_cnt)))"""
          .stripMargin)).as("e"))
      .select(col("series_key"), col("ts_ms"), col("bucket_schema"),
        col("zero_threshold"), col("custom_values"),
        col("e.kind"), col("e.idx"), col("e.cnt"))
    // Absence handling WITHOUT a dense (ts × bucket) fill — a month range
    // at scrape resolution × dozens of buckets would materialize millions
    // of rows per series. The sparse-equivalent arithmetic: a bucket
    // absent from a sample observes 0, so between two PRESENT entries
    // separated by other samples the true sequence is cnt → 0 (a drop =
    // reset, contributes 0) → … → cnt₂ (a rise from 0, contributes cnt₂).
    // That collapses to a per-present-entry rule needing only "was this
    // bucket present at the series' immediately previous sample?":
    //   prev entry IS the previous sample → reset-aware delta vs it;
    //   otherwise (absent in between, or first appearance after other
    //   samples) → the full cnt; overall-first sample → 0.
    // Proven equivalent to the dense fill by the unchanged test
    // expectations (reset/absence cases are all hand-computed).
    //
    // Both helper quantities come from windows over the SAME series_key
    // partitioning (one exchange, two in-partition sorts) instead of the
    // old distinct+lag+join round trip:
    //  - the previous distinct sample time is the max ts strictly below
    //    the current one (a range frame — duplicate ts rows per bucket
    //    entry don't disturb it);
    //  - the per-(kind, idx) lag comes from one total order (kind, idx,
    //    ts) with the lagged row guarded to be the same (kind, idx).
    val wPrevSample = Window.partitionBy("series_key").orderBy("ts_ms")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wLag = Window.partitionBy("series_key")
      .orderBy("kind", "idx", "ts_ms")
    val sameBucket = lag(col("kind"), 1).over(wLag) === col("kind") &&
      lag(col("idx"), 1).over(wLag) === col("idx")
    val prev = when(sameBucket, lag(col("cnt"), 1).over(wLag))
    val prevTs = when(sameBucket, lag(col("ts_ms"), 1).over(wLag))
    val dense = entries
      .withColumn("__prev_sample_ts__", max(col("ts_ms")).over(wPrevSample))
    // grouping identity: the series alone (whole-window increase) or
    // (series, tumbling time bucket) for range evaluation — deltas chain
    // across the whole input either way, attributed to the later sample
    val keyCols: Seq[String] =
      if (bucketMs.isEmpty) Seq("series_key") else Seq("series_key", "bucket_ms")
    def withBucket(df: DataFrame): DataFrame = bucketMs match {
      case Some(b) => df.withColumn("bucket_ms",
        floor(col("ts_ms") / lit(b)).cast("long") * b)
      case None => df
    }
    val incs = withBucket(dense
      .withColumn("__d__",
        when(prev.isNull,
          // first present entry of this bucket: 0 when it is the series'
          // overall-first sample, else a rise from the implicit 0
          when(col("__prev_sample_ts__").isNull, lit(0.0))
            .otherwise(col("cnt")))
          .when(prevTs === col("__prev_sample_ts__"),
            // contiguous presence: the ordinary reset-aware delta
            when(col("cnt") >= prev, col("cnt") - prev)
              .otherwise(col("cnt")))
          // absent at the previous sample: drop-to-0 was a reset (0
          // contribution), this entry is the rise from 0
          .otherwise(col("cnt"))))
      .groupBy((keyCols :+ "kind" :+ "idx").map(MetricEngine.qcol): _*)
      .agg(sum(col("__d__")).as("inc"),
        // meta partials (uniform after downscaleToCoarsest — min is
        // exact, not a guess), re-aggregated per key group below
        max(col("ts_ms")).as("__ts__"),
        min(col("bucket_schema")).as("__bs__"),
        max(col("zero_threshold")).as("__zt__"),
        collect_set(col("custom_values")).as("__cvs__"))
    // NHCB bucket indexes are positions into custom_values — a bounds
    // change mid-window has no exact conversion (unlike standard
    // schemas); reject instead of chaining incomparable indexes
    assembleFromParts(incs, keyCols,
      "NHCB custom bucket bounds changed within the rate window")
  }

  /** SUM of native histograms across series — the aggregation behind
    * `histogram_quantile(q, sum by (...) (rate(m[w])))` (Prometheus adds
    * native histograms bucket-wise): group the input histogram rows by
    * `keyCols` (label columns and/or `bucket_ms`, which must exist on the
    * frame), sum every bucket and the zero bucket per group, keep the
    * widest zero threshold. Mixed STANDARD schemas within a group convert
    * to the coarsest present first ([[downscaleToCoarsest]] — exact, what
    * Prometheus does when summed targets scrape on different schemas);
    * only mixed NHCB bounds reject (no exact conversion exists). Shape:
    * one (keys, bucket) shuffle over exploded entries + the per-group
    * rebuild — linear in present entries, like [[increase]]. */
  def sumHistograms(rows0: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "sumHistograms needs at least one key column")
    val rows = downscaleToCoarsest(rows0, keyCols)
    // ONE pass: meta columns ride the explode (constant per source row)
    // and re-aggregate with the bucket sums, instead of a second scan of
    // the upstream subtree + per-kind assembly joins (see [[increase]])
    val entries = rows.select(keyCols.map(MetricEngine.qcol) ++
      Seq(col("ts_ms"), col("bucket_schema"), col("zero_threshold"),
        col("custom_values")) :+
      explode(expr(
        """concat(
          |  array(named_struct('kind', 0, 'idx', 0, 'cnt', zero_count)),
          |  array(named_struct('kind', 2, 'idx', 0, 'cnt', count)),
          |  transform(arrays_zip(pos_idx, pos_cnt),
          |    z -> named_struct('kind', 1, 'idx', z.pos_idx, 'cnt', z.pos_cnt)),
          |  transform(arrays_zip(neg_idx, neg_cnt),
          |    z -> named_struct('kind', -1, 'idx', z.neg_idx, 'cnt', z.neg_cnt)))"""
          .stripMargin)).as("e"): _*)
      .select(keyCols.map(MetricEngine.qcol) ++
        Seq(col("ts_ms"), col("bucket_schema"), col("zero_threshold"),
          col("custom_values"), col("e.kind"), col("e.idx"),
          col("e.cnt")): _*)
    val incs = entries.groupBy((keyCols :+ "kind" :+ "idx")
        .map(MetricEngine.qcol): _*)
      .agg(sum(col("cnt")).as("inc"),
        max(col("ts_ms")).as("__ts__"),
        // uniform after downscaleToCoarsest — min is exact, not a guess
        min(col("bucket_schema")).as("__bs__"),
        max(col("zero_threshold")).as("__zt__"),
        collect_set(col("custom_values")).as("__cvs__"))
    // NHCB bucket indexes are positions into custom_values — bounds
    // must be identical across the summed series or the sum is
    // meaningless (standard schemas carry empty arrays, one set value)
    assembleFromParts(incs, keyCols,
      "cannot sum NHCB histograms with different custom bucket bounds")
  }

  /** Final re-aggregation shared by [[increase]] and [[sumHistograms]]:
    * per-(keys, kind, idx) sums + meta partials (`__ts__`/`__bs__`/
    * `__zt__`/`__cvs__` columns) → one histogram row per key group, in a
    * SINGLE conditional aggregation — no per-kind branches, no joins, no
    * recompute of the upstream subtree. */
  private def assembleFromParts(incs: DataFrame, keyCols: Seq[String],
      nhcbError: String): DataFrame = {
    val kc = keyCols.map(MetricEngine.qcol)
    incs.groupBy(kc: _*).agg(
        max(col("__ts__")).as("ts_ms"),
        min(col("__bs__")).as("bucket_schema"),
        max(col("__zt__")).as("zero_threshold"),
        array_distinct(flatten(collect_list(col("__cvs__")))).as("__cvsu__"),
        sum(when(col("kind") === 0, col("inc"))).as("zero_count"),
        // the stored top-level count participates as its own kind (2):
        // NaN observations increment count WITHOUT landing in any bucket,
        // so a bucket-sum recompute under-reports the observation rate
        sum(when(col("kind") === 2, col("inc"))).as("__count_f__"),
        sort_array(collect_list(when(col("kind") === 1,
          struct(col("idx"), col("inc"))))).as("__pa__"),
        sort_array(collect_list(when(col("kind") === -1,
          struct(col("idx"), col("inc"))))).as("__na__"))
      .select(kc ++ Seq(col("ts_ms"), col("bucket_schema"),
        col("zero_threshold"),
        expr("CASE WHEN size(__cvsu__) = 0 THEN CAST(array() AS ARRAY<DOUBLE>) " +
          "WHEN size(__cvsu__) = 1 THEN element_at(__cvsu__, 1) " +
          s"ELSE CAST(raise_error('$nhcbError') AS ARRAY<DOUBLE>) END")
          .as("custom_values"),
        coalesce(col("zero_count"), lit(0.0)).as("zero_count"),
        expr("transform(__pa__, x -> x.idx)").as("pos_idx"),
        expr("transform(__pa__, x -> x.inc)").as("pos_cnt"),
        expr("transform(__na__, x -> x.idx)").as("neg_idx"),
        expr("transform(__na__, x -> x.inc)").as("neg_cnt"),
        col("__count_f__")): _*)
      .withColumn("count",
        // the count-field delta when present (includes NaN observations);
        // the bucket-mass recompute only as a legacy fallback
        coalesce(col("__count_f__"),
          col("zero_count") +
            expr("aggregate(pos_cnt, CAST(0.0 AS DOUBLE), (a, x) -> a + x)") +
            expr("aggregate(neg_cnt, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")))
      .drop("__count_f__")
  }

  /** Rebuild histogram rows from per-(keys, kind, idx) counts + per-keys
    * meta — the [[graft.metric.HistogramRollup]] assembly tail (its incs
    * come from grid partials, its meta carries validated-uniform schema).
    * One conditional aggregation + ONE join — the old per-kind filtered
    * branches re-computed the incs subtree four times and joined each. */
  private[metric] def assembleHistograms(incs: DataFrame, meta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val kc = keyCols.map(MetricEngine.qcol)
    val parts = incs.groupBy(kc: _*).agg(
      sum(when(col("kind") === 0, col("inc"))).as("zero_count"),
      // the stored top-level count participates as its own kind (2): NaN
      // observations increment count WITHOUT landing in any bucket, so a
      // bucket-sum recompute under-reports the observation rate
      sum(when(col("kind") === 2, col("inc"))).as("__count_f__"),
      sort_array(collect_list(when(col("kind") === 1,
        struct(col("idx"), col("inc"))))).as("__pa__"),
      sort_array(collect_list(when(col("kind") === -1,
        struct(col("idx"), col("inc"))))).as("__na__"))
    meta
      .join(parts, keyCols, "left")
      .withColumn("zero_count", coalesce(col("zero_count"), lit(0.0)))
      .withColumn("pos_idx", coalesce(
        expr("transform(__pa__, x -> x.idx)"),
        expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("pos_cnt", coalesce(
        expr("transform(__pa__, x -> x.inc)"),
        expr("CAST(array() AS ARRAY<DOUBLE>)")))
      .withColumn("neg_idx", coalesce(
        expr("transform(__na__, x -> x.idx)"),
        expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("neg_cnt", coalesce(
        expr("transform(__na__, x -> x.inc)"),
        expr("CAST(array() AS ARRAY<DOUBLE>)")))
      .withColumn("count",
        // the count-field delta when present (includes NaN observations);
        // the bucket-mass recompute only as a legacy fallback
        coalesce(col("__count_f__"),
          col("zero_count") +
            expr("aggregate(pos_cnt, CAST(0.0 AS DOUBLE), (a, x) -> a + x)") +
            expr("aggregate(neg_cnt, CAST(0.0 AS DOUBLE), (a, x) -> a + x)")))
      .drop("__count_f__", "__pa__", "__na__")
  }

  /** `histogram_fraction(lo, hi)` over histogram rows: the fraction of
    * observations inside `[lo, hi]`, linear within each bucket (the same
    * within-bucket assumption as [[quantile]]): each bucket contributes
    * `cnt x overlap([lo,hi], [b.lo,b.hi]) / width`; zero-width buckets
    * (the zero bucket at zeroThreshold 0) contribute fully when their
    * point lies inside the bounds. `lo > hi` yields 0; an empty histogram
    * yields NaN (Prometheus conventions). Infinite bounds work (`-Inf`/
    * `Inf` — the canonical CDF shape); the infinite-width NHCB overflow
    * bucket contributes fully only when the bounds cover both its
    * endpoints (linear interpolation has zero mass at any finite point of
    * an infinite bucket). Output: the input's identity columns +
    * `value`. */
  def fraction(rows: DataFrame, lo: Double, hi: Double): DataFrame = {
    val idCols = histIdCols(rows)
    // QUOTED literals: a bare interpolated -Infinity/Infinity/NaN token
    // parses as a COLUMN reference and fails analysis — and
    // histogram_fraction(-Inf, x, m) is the canonical CDF shape (the
    // bucketsExpr below uses the same quoted form)
    val loS = s"CAST('$lo' AS DOUBLE)"
    val hiS = s"CAST('$hi' AS DOUBLE)"
    val overlap =
      s"""aggregate(__buckets__, CAST(0.0 AS DOUBLE), (acc, b) ->
         |  acc + b.cnt * (CASE
         |    WHEN b.hi <= b.lo THEN
         |      IF($loS <= b.lo AND b.lo <= $hiS,
         |         CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
         |    WHEN b.hi - b.lo = CAST('Infinity' AS DOUBLE) THEN
         |      IF($loS <= b.lo AND $hiS >= b.hi,
         |         CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
         |    ELSE greatest(CAST(0.0 AS DOUBLE),
         |      least(CAST(1.0 AS DOUBLE),
         |        (least($hiS, b.hi) - greatest($loS, b.lo)) / (b.hi - b.lo)))
         |  END))""".stripMargin
    rows
      .withColumn("__buckets__", expr(bucketsExpr))
      .withColumn("value",
        when(col("count") <= 0.0, lit(Double.NaN))
          .when(lit(lo) > lit(hi), lit(0.0))
          .otherwise(expr(overlap) / col("count")))
      .select((idCols.map(MetricEngine.qcol) :+ col("value")): _*)
  }

  /** `histogram_stddev` / `histogram_stdvar` over histogram rows —
    * Prometheus's estimate (promql functions.go): each STANDARD-schema
    * bucket's observations sit at its GEOMETRIC midpoint `sign·sqrt(hi·lo)`
    * (0 for any bucket straddling zero, so the zero bucket contributes 0);
    * NHCB custom buckets (schema -53) use the ARITHMETIC midpoint
    * `(lo+hi)/2` — Prometheus's custom-bucket rule (the geometric form is
    * meaningless for bounds that may include 0 or negatives, and
    * Prometheus switched custom buckets to the arithmetic mean).
    * Variance = Σ cnt·(mid − mean)² / count with mean = sum/count.
    * Empty histogram → NaN. Output: identity columns + `value`. */
  def stdvar(rows: DataFrame, stddev: Boolean): DataFrame = {
    val idCols = histIdCols(rows)
    val mid =
      """(CASE WHEN bucket_schema = -53
        |      THEN (b.lo + b.hi) / CAST(2.0 AS DOUBLE)
        |      WHEN b.lo <= CAST(0.0 AS DOUBLE)
        |        AND CAST(0.0 AS DOUBLE) <= b.hi THEN CAST(0.0 AS DOUBLE)
        |      WHEN b.hi < CAST(0.0 AS DOUBLE)
        |        THEN -sqrt(b.hi * b.lo)
        |      ELSE sqrt(b.hi * b.lo) END)""".stripMargin
    val varExpr =
      s"""aggregate(__buckets__, CAST(0.0 AS DOUBLE), (acc, b) ->
         |  acc + b.cnt * ($mid - __mean__) * ($mid - __mean__))""".stripMargin
    val out = rows
      .withColumn("__buckets__", expr(bucketsExpr))
      // zero-observation histogram: guard the mean's division — ANSI mode
      // (Spark 4's default) THROWS on /0, and this column is its own
      // projection so the count<=0 guard on `value` below cannot
      // short-circuit it; the NaN mean feeds only the unused branch
      .withColumn("__mean__",
        when(col("count") <= 0.0, lit(Double.NaN))
          .otherwise(col("sum") / col("count")))
      .withColumn("value",
        when(col("count") <= 0.0, lit(Double.NaN))
          .otherwise(expr(varExpr) / col("count")))
    val fin =
      if (stddev) out.withColumn("value", sqrt(col("value"))) else out
    fin.select((idCols.map(MetricEngine.qcol) :+ col("value")): _*)
  }

  /** Identity columns of a histogram frame = everything that is not a
    * histogram payload column. */
  private def histIdCols(rows: DataFrame): Seq[String] =
    rows.columns.filterNot(Set("count", "sum", "bucket_schema",
      "zero_threshold", "zero_count", "pos_idx", "pos_cnt", "neg_idx",
      "neg_cnt", "custom_values").contains).toSeq

  /** The ordered (lo, hi, cnt) bucket array of one histogram row —
    * negative buckets most-negative-first, the zero bucket (bounds
    * collapsed on the empty side, as Prometheus does), positive buckets
    * ascending; standard exponential schemas from base = 2^(2^-schema),
    * NHCB (schema -53) from `custom_values`. Shared by [[quantile]] and
    * [[fraction]]. */
  private val bucketsExpr: String = {
    val base = "power(CAST(2.0 AS DOUBLE), " +
      "power(CAST(2.0 AS DOUBLE), -CAST(bucket_schema AS DOUBLE)))"
    s"""concat(
       |  transform(reverse(arrays_zip(neg_idx, neg_cnt)), z ->
       |    named_struct(
       |      'lo', -power($base, CAST(z.neg_idx AS DOUBLE)),
       |      'hi', -power($base, CAST(z.neg_idx AS DOUBLE) - 1.0D),
       |      'cnt', z.neg_cnt)),
       |  array(named_struct(
       |    'lo', IF(size(neg_idx) = 0 AND size(pos_idx) > 0,
       |             CAST(0.0 AS DOUBLE), -zero_threshold),
       |    'hi', IF(size(pos_idx) = 0 AND size(neg_idx) > 0,
       |             CAST(0.0 AS DOUBLE), zero_threshold),
       |    'cnt', zero_count)),
       |  transform(arrays_zip(pos_idx, pos_cnt), z ->
       |    IF(bucket_schema = -53,
       |      named_struct(
       |        'lo', IF(z.pos_idx <= 0 OR size(custom_values) = 0,
       |                 CAST(0.0 AS DOUBLE),
       |                 element_at(custom_values,
       |                   LEAST(z.pos_idx, size(custom_values)))),
       |        'hi', IF(size(custom_values) = 0, CAST('Infinity' AS DOUBLE),
       |                 element_at(custom_values,
       |                   LEAST(z.pos_idx + 1, size(custom_values)))),
       |        'cnt', z.pos_cnt),
       |      named_struct(
       |        'lo', power($base, CAST(z.pos_idx AS DOUBLE) - 1.0D),
       |        'hi', power($base, CAST(z.pos_idx AS DOUBLE)),
       |        'cnt', z.pos_cnt))))""".stripMargin
  }
}
