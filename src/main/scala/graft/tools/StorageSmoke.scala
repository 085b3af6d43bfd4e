package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.storage._

/** Runtime smoke drive of the public storage API: write two overlapping
  * batches, scan with predicate + merge-on-read, compact, re-scan.
  * Run: `sbt "runMain graft.tools.StorageSmoke"` */
object StorageSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("graft-smoke").toString
    println(s"[smoke] root=$root")

    val schema = StructType(Seq(
      StructField("pk1", IntegerType), StructField("pk2", IntegerType),
      StructField("value", LongType)))
    val store = new TimeMergeStorage(spark, root,
      StorageSchema(schema, numPrimaryKeys = 2), segmentMs = 7200000L)

    def batch(rows: Seq[(Int, Int, Long)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2, r._3)), 1), schema)

    store.write(batch(Seq((11, 100, 2L), (11, 100, 7L), (9, 1, 4L), (10, 2, 6L), (5, 3, 1L))),
      TimeRange(1, 10))
    store.write(batch(Seq((11, 100, 22L), (11, 99, 77L), (9, 1, 44L), (10, 2, 66L))),
      TimeRange(10, 20))

    println("[smoke] full scan (merged, sorted):")
    store.scanSorted().show()
    println("[smoke] predicate scan pk1=11:")
    store.scanSorted(ScanRequest(predicates = Seq(col("pk1") === 11))).show()
    println("[smoke] manifest before compaction: " + store.manifest.allSsts().map(_.id))

    val compactor = new Compactor(store, CompactionConfig(inputSstMinNum = 2))
    println("[smoke] compaction ran: " + compactor.runOnce())
    println("[smoke] manifest after compaction: " + store.manifest.allSsts().map(f => (f.id, f.numRows)))
    println("[smoke] post-compaction scan:")
    store.scanSorted().show()
    // probes: empty time range; cross-segment write must be rejected
    val empty = store.scan(ScanRequest(range = TimeRange(999999999L, 999999999999L)))
    println(s"[smoke] empty-range scan rows=${empty.count()} schema=${empty.schema.fieldNames.mkString(",")}")
    val crossed = try { store.write(batch(Seq((1, 1, 1L))), TimeRange(1, 7200001L)); "ACCEPTED (BUG)" }
      catch { case e: IllegalArgumentException => s"rejected: ${e.getMessage.take(60)}" }
    println(s"[smoke] cross-segment write: $crossed")
    // bucketed (multi-file) write path
    val store2 = new TimeMergeStorage(spark, Files.createTempDirectory("graft-smoke-b").toString,
      StorageSchema(schema, numPrimaryKeys = 2), segmentMs = 7200000L)
    val big = spark.createDataFrame(spark.sparkContext.parallelize(
      (1 to 1000).map(i => Row(i % 50, i, i.toLong)), 8), schema)
    val ssts = store2.writeBucketed(big, TimeRange(0, 7200000L), numBuckets = 8)
    println(s"[smoke] bucketed write: ${ssts.size} SSTs, rows=${ssts.map(_.numRows).sum}, scan=${store2.scan().count()}")
    spark.stop()
  }
}
