package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.metric._
import graft.storage.TimeRange

/** Measured evidence for the rollup scan-reduction claim (SCALE.md): a
  * DENSE workload — many samples per series per grid bucket, the shape
  * rollups exist for; the sf tables are too sparse (~1 sample/series/day)
  * to show it honestly. Generates `nSeries` sawtooth counters at
  * `intervalMs` cadence over `days`, then times:
  *   - full refresh (the one-time backfill),
  *   - incremental refresh after a tiny late write (must re-roll ~1
  *     segment, not the table),
  *   - raw vs rollup-ROUTED hourly sum and increase on an UNALIGNED
  *     live-style range (the degenerate-partial edge splice),
  *   - and asserts routed == raw on both.
  * Run: `sbt "runMain graft.tools.RollupProbe [nSeries] [days] [intervalMs]"` */
object RollupProbe {
  def main(args: Array[String]): Unit = {
    val nSeries = args.headOption.map(_.toInt).getOrElse(200)
    val days = args.lift(1).map(_.toInt).getOrElse(3)
    val intervalMs = args.lift(2).map(_.toLong).getOrElse(15000L)
    val spark = graft.GraftSession.create(16)
    spark.sparkContext.setLogLevel("WARN")

    val t0 = 1723680000000L // day-aligned
    val stepsPerSeries = days * 86400000L / intervalMs
    val total = nSeries * stepsPerSeries
    println(s"[probe] series=$nSeries days=$days interval=${intervalMs}ms " +
      s"samples=$total (${stepsPerSeries} per series, " +
      s"${3600000L / intervalMs} per series per 1h bucket)")

    val engine = new MetricEngine(spark,
      Files.createTempDirectory("graft-rollup-probe").toString)
    val samples = spark.range(total).select(
      lit("probe").as("name"),
      map(lit("host"), concat(lit("h"), (col("id") % nSeries).cast("string")))
        .as("labels"),
      (lit(t0) + floor(col("id") / nSeries).cast("long") * intervalMs)
        .as("timestamp"),
      // sawtooth counter: resets every 997 steps, same phase across series
      (floor(col("id") / nSeries).cast("long") % 997).cast("double")
        .as("value"))
    val tw0 = System.nanoTime()
    engine.write(samples)
    println(f"[probe] ingest ${(System.nanoTime() - tw0) / 1e9}%.1fs")

    val rollup = new Rollup(engine, gridMs = 3600000L)
    val tr0 = System.nanoTime()
    val full = rollup.refresh()
    println(f"[probe] full refresh ${(System.nanoTime() - tr0) / 1e9}%.1fs " +
      s"(${full.segmentsRolled} segments, " +
      s"${rollup.store.scan().count()} rollup rows)")

    // tiny late write -> refresh must touch ~1 segment, not the table
    engine.write(spark.createDataFrame(Seq(
      Sample("probe", Map("host" -> "h0"), t0 + 1234L, 42.0))))
    val ti0 = System.nanoTime()
    val inc = rollup.refresh()
    println(f"[probe] incremental refresh ${(System.nanoTime() - ti0) / 1e9}%.1fs " +
      s"(${inc.segmentsRolled} segment(s) re-rolled)")
    engine.registerRollup(rollup)
    require(rollup.isFresh, "rollup must be fresh after refresh")

    // live-style UNALIGNED range (edge splice on both bounds)
    val range = TimeRange(t0 + 137L, t0 + days * 86400000L - 4111L)
    def median3(f: => Long): (Double, Long) = {
      val warm = f
      val ts = (1 to 3).map { _ =>
        val s = System.nanoTime(); val n = f; ((System.nanoTime() - s) / 1e9, n)
      }
      (ts.map(_._1).sorted.apply(1), warm)
    }
    def rawQ(rate: Boolean) = engine.query(MetricQuery("probe", range = range,
      stepMs = Some(3600000L), agg = MetricAgg.Sum, groupByTag = Some("host"),
      rate = rate))
    def routedQ(expr: String) =
      engine.queryPromQL(expr, range, Some(3600000L))

    for ((label, raw, routed) <- Seq(
        ("sum", rawQ(rate = false), routedQ("sum by (host) (probe)")),
        ("increase", rawQ(rate = true),
          routedQ("sum by (host) (increase(probe[1h]))")))) {
      require(routed.inputFiles.exists(_.contains("_rollup_")),
        s"$label did not route through the rollup")
      val (rawSec, rawN) = median3(raw.count())
      val (rouSec, rouN) = median3(routed.count())
      require(rawN == rouN, s"$label row counts differ: $rawN vs $rouN")
      val a = raw.withColumn("value", round(col("value"), 6))
        .collect().map(_.toSeq).toSet
      val b = routed.withColumn("value", round(col("value"), 6))
        .collect().map(_.toSeq).toSet
      require(a == b, s"$label routed != raw")
      println(f"[probe] $label%-8s raw=$rawSec%.2fs routed=$rouSec%.2fs " +
        f"speedup=${rawSec / rouSec}%.1fx (rows=$rawN, values equal)")
    }
    println("[probe] OK")
    spark.stop()
  }
}
