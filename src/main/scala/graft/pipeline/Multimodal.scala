package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * contract (schema, partition sizing, per-partition batch shape) is real;
  * the actual codec decode is STUBBED with a deterministic fake because no
  * image/audio libraries ship in this container — swap `decodeStub` for a
  * real codec (e.g. javacv) without touching the pipeline shape.
  */
object Multimodal {

  /** Canonical multimodal schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Wrap a raw binary column into the canonical (payload, meta) shape.
    * Width/height here come from the deterministic stub "decoder". */
  def toMedia(df: DataFrame, idCol: String, binCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("payload"),
      struct(
        lit(mime).as("mime"),
        length(col(binCol)).cast("long").as("n_bytes"),
        // STUB decode: deterministic fake dimensions derived from content
        (pmod(crc32(col(binCol)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(crc32(col(binCol)) / 1920, lit(1080)) + 1).cast("int").as("height")
      ).as("meta"))

  /** Feature extraction over media partitions. Mirrors the mapInPandas batch
    * shape: one iterator of rows per partition, arbitrary per-batch native
    * code allowed inside. The "feature" is a stubbed deterministic
    * fingerprint; a real implementation would decode `payload` here. */
  def extractFeatures(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("feature", ArrayType(DoubleType))))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id")) // bound partition memory: payloads are big
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          val payload = r.getAs[Array[Byte]]("payload")
          // ??? real decode goes here; deterministic stub feature instead
          // (unsigned byte view: feature space is [0,1], and the stub stays
          // reproducible in engines without signed bytes):
          val feat = Array.tabulate(4)(i =>
            if (payload.isEmpty) 0.0
            else (payload(i % payload.length) & 0xFF).toDouble / 255.0)
          Row(id, payload.length.toLong, feat)
        }
      }(enc)
  }
}
