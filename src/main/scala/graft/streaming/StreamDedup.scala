package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Streaming exact deduplication for training-data ingest: keep the first
  * document per normalized-content fingerprint
  * ([[graft.pipeline.TextAnalysis.fingerprint]] — md5 of lowercased,
  * space-stripped text, the same key the batch `d1_exact_groups` path
  * groups on, so batch and stream agree on what counts as a duplicate).
  *
  * Scale: `dropDuplicatesWithinWatermark` bounds the dedup state to the
  * watermark horizon — a plain `dropDuplicates` on an unbounded stream
  * accretes one state row per distinct document forever, which is exactly
  * the state blow-up a 100 TB/day ingest cannot carry. In-watermark
  * duplicates (crawler retries, mirror bursts — the overwhelmingly common
  * case) are dropped in-flight; cross-history duplicates are left to the
  * batch dedup over storage (`Dedup.exactGroups` / `duplicateClusters`),
  * mirroring the metric path's late-data policy (merge-on-read repairs). */
object StreamDedup {

  /** `docs` must be a streaming frame with an event-time column `tsCol`
    * (TimestampType). Emits the input columns plus the `fp` fingerprint. */
  def byFingerprint(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
