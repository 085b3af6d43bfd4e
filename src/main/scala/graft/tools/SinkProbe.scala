package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Throughput probe for the `graft` STREAMING SINK
  * (`df.writeStream.format("graft")`, [[graft.sources.GraftSink]]) — the
  * SQL-edge sibling of [[MetricSoak]]'s engine-path measurement: N
  * micro-batches of M rows each through the sink (per-segment sorted SST
  * commits + the (queryId, batchId) idempotency mark), optional
  * `compactEvery` passes in-line, then a merged read-back count.
  * Results land in SCALE.md's streaming-ingest section.
  *
  * Run: `sbt "runMain graft.tools.SinkProbe [numBatches] [rowsPerBatch] [compactEvery]"`
  */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val numBatches = args.headOption.map(_.toInt).getOrElse(10)
    val rows = args.lift(1).map(_.toInt).getOrElse(10000)
    val compactEvery = args.lift(2).map(_.toInt)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = Files.createTempDirectory("graft-sinkprobe").toString
    val mem = MemoryStream[(Long, Long, Double)]
    var w = mem.toDF().toDF("pk", "tms", "v")
      .writeStream.format("graft")
      .option("root", root).option("numPrimaryKeys", "1")
      .option("segmentMs", "3600000").option("timestampColumn", "tms")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sinkprobe-ckpt").toString)
    compactEvery.foreach(n => w = w.option("compactEvery", n.toString))
    val q = w.start()

    val t0 = System.nanoTime()
    try {
      (0 until numBatches).foreach { b =>
        val base = b.toLong * rows
        mem.addData((0 until rows).map(i =>
          (base + i, (base + i) % 3600000L, (base + i).toDouble)))
        q.processAllAvailable()
      }
    } finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    val store = graft.storage.TimeMergeStorage.open(spark, root)
    val ssts = store.manifest.allSsts().size
    val count = spark.read.format("graft").option("root", root).load().count()
    val total = numBatches.toLong * rows
    println(f"[sinkprobe] throughput=${total / sec}%.0f rows/s over $total rows " +
      f"($numBatches batches x $rows), wall=${sec}%.1f s, " +
      s"ssts=$ssts, readback=$count, compactEvery=${compactEvery.getOrElse(0)}")
    require(count == total, s"read-back mismatch: $count vs $total")
    spark.stop()
  }
}
