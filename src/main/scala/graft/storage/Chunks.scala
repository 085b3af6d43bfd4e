package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The RFC's chunked data representation (docs/rfcs/20240827-metric-engine.md:
  * 218-232: "30 minutes of samples batch-encoded into one row"). The
  * reference packs opaque bytes and merges by byte-append
  * (BytesMergeOperator); the Spark-idiomatic equivalent chosen in SURVEY §1.2
  * is an `ArrayType(StructType(ts, value))` column built with `collect_list`
  * over time windows — columnar, mergeable by `Append` mode (array concat),
  * and decodable with `explode` without custom codecs. */
object Chunks {

  /** Encode rows into one chunk row per (keys, chunk window). The chunk
    * array is time-sorted; `n_samples`/`t_min`/`t_max` ride along as prune
    * metadata (the analog of SST row-group stats). */
  def encode(df: DataFrame, keys: Seq[String], tsCol: String, valueCol: String,
      chunkMs: Long): DataFrame =
    df.groupBy(keys.map(col) :+
        (floor(col(tsCol) / lit(chunkMs)).cast("long") * chunkMs).as("chunk_start"): _*)
      .agg(
        sort_array(collect_list(struct(col(tsCol).as("ts"), col(valueCol).as("value"))))
          .as("chunk"),
        count(lit(1)).as("n_samples"),
        min(col(tsCol)).as("t_min"), max(col(tsCol)).as("t_max"))

  /** Decode chunk rows back to one row per sample. */
  def decode(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col) :+ explode(col("chunk")).as("s"): _*)
      .select(keys.map(col) :+ col("s.ts").as("ts") :+ col("s.value").as("value"): _*)
}
