package graft.metric

import org.apache.spark.sql.DataFrame
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
  * `(custom_values[i-1], custom_values[i]]` with bucket 0 starting at 0.
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
    val idCols = rows.columns.filterNot(Set("count", "sum", "bucket_schema",
      "zero_threshold", "zero_count", "pos_idx", "pos_cnt", "neg_idx",
      "neg_cnt", "custom_values").contains).toSeq
    val base = "power(CAST(2.0 AS DOUBLE), " +
      "power(CAST(2.0 AS DOUBLE), -CAST(bucket_schema AS DOUBLE)))"
    val buckets =
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
         |        'lo', IF(z.pos_idx = 0, CAST(0.0 AS DOUBLE),
         |                 element_at(custom_values, z.pos_idx)),
         |        'hi', element_at(custom_values, z.pos_idx + 1),
         |        'cnt', z.pos_cnt),
         |      named_struct(
         |        'lo', power($base, CAST(z.pos_idx AS DOUBLE) - 1.0D),
         |        'hi', power($base, CAST(z.pos_idx AS DOUBLE)),
         |        'cnt', z.pos_cnt))))""".stripMargin
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
      .select((idCols.map(col) :+ col("phi") :+ col("value")): _*)
  }
}
