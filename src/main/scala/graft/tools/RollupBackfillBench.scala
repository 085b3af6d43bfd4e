package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.metric._
import graft.storage.TimeRange

/** Measures the round-11 one-job rollup backfill against the equivalent
  * per-segment refresh cadence (the shape the old sequential loop and a
  * steady-state ticker both produce): N hourly segments of data, then
  *
  *  - COLD: one `refresh()` over all N dirty segments — one scan+shuffle+
  *    write job via `TimeMergeStorage.writeSegmented`;
  *  - INCREMENTAL: a second engine rolled after EVERY segment write —
  *    N single-segment refreshes, N Spark jobs (what a cold backfill cost
  *    before round 11, and what a ticker pays when it never falls behind).
  *
  * Run: `sbt "runMain graft.tools.RollupBackfillBench [segments] [rowsPerSeg]"`
  */
object RollupBackfillBench {
  def main(args: Array[String]): Unit = {
    val segments = args.headOption.map(_.toInt).getOrElse(48)
    val rowsPerSeg = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hour = 3600000L

    def freshEngine(): MetricEngine = new MetricEngine(spark,
      Files.createTempDirectory("graft-backfill").toString, segmentMs = hour)

    def segBatch(seg: Int): Seq[Sample] = (0 until rowsPerSeg).map { i =>
      Sample("cpu", Map("host" -> s"h${i % 16}"),
        seg * hour + (i.toLong * hour / rowsPerSeg), i.toDouble)
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // cold backfill: ingest everything, then ONE refresh over N segments
    val cold = freshEngine()
    (0 until segments).foreach(seg =>
      cold.write(spark.createDataFrame(segBatch(seg))))
    val rCold = new Rollup(cold, gridMs = hour)
    val (statsCold, tCold) = timed(rCold.refresh())
    require(statsCold.segmentsRolled == segments,
      s"expected $segments dirty, got ${statsCold.segmentsRolled}")

    // per-segment cadence: refresh after every write (N one-segment rolls)
    val incr = freshEngine()
    val rIncr = new Rollup(incr, gridMs = hour)
    var tIncr = 0.0
    (0 until segments).foreach { seg =>
      incr.write(spark.createDataFrame(segBatch(seg)))
      val (stats, t) = timed(rIncr.refresh())
      require(stats.segmentsRolled == 1)
      tIncr += t
    }

    // both rollups answer identically
    val q = MetricQuery("cpu", stepMs = Some(hour), agg = MetricAgg.Sum,
      groupByTag = Some("host"),
      range = TimeRange(Long.MinValue, Long.MaxValue))
    val a = rCold.query(q).collect().map(_.toSeq).toSet
    val b = rIncr.query(q).collect().map(_.toSeq).toSet
    require(a == b, "cold backfill and incremental rollups disagree")

    println(f"[backfill] segments=$segments rows/seg=$rowsPerSeg " +
      f"cold(one-job)=$tCold%.1fs perSegment(sum of $segments)=$tIncr%.1fs " +
      f"speedup=${tIncr / tCold}%.1fx")
    spark.stop()
  }
}
