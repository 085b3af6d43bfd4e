package graft.tools

import org.apache.spark.sql.functions._

/** Metric-name fan-out probe (round 14): evidence that the PromQL
  * evaluator's broad-`__name__`-regex path is constant-cost in the
  * matched-name count. For each N it builds a fresh engine with N
  * metrics (one sample each), then times the SAME bare-regex query
  * (`sum by (__name__) ({__name__=~"fan_.*"})`) end to end and counts
  * the Spark jobs it launched. Before the round-14 cap the evaluator
  * collected every matched name and built one scan branch + one
  * metric-id lookup job per name — time and jobs grew linearly in N;
  * with the cap both must stay ~flat past NameUnionFanout (16).
  *
  * Usage: runMain graft.tools.FanoutProbe [N[,N...]]  (default
  * 4,64,1024). Prints one `[fanout]` line per N: rows (must equal N),
  * wall seconds, and driver job count for the query.
  */
object FanoutProbe {
  def main(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(',').toSeq.map(_.toInt))
      .getOrElse(Seq(4, 64, 1024))
    val spark = graft.GraftSession.create(32)
    import spark.implicits._
    for (n <- ns) try {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-fanout-$n").toString
      val e = new graft.metric.MetricEngine(spark, root)
      val t0w = System.nanoTime()
      e.write((0 until n).map(i =>
        graft.metric.Sample(f"fan_$i%05d", Map("host" -> s"h${i % 3}"),
          1723680000000L + i, i.toDouble)).toDF())
      val wSec = (System.nanoTime() - t0w) / 1e9
      val range = graft.storage.TimeRange(Long.MinValue, Long.MaxValue)
      val q = """sum by (__name__) ({__name__=~"fan_.*"})"""
      def timed(): (Long, Double, Int) = {
        val group = s"fanout-$n-${System.nanoTime()}"
        spark.sparkContext.setJobGroup(group, "fanout probe")
        val t0 = System.nanoTime()
        val rows = try e.queryPromQL(q, range).count()
          finally spark.sparkContext.clearJobGroup()
        val sec = (System.nanoTime() - t0) / 1e9
        val jobs = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        (rows, sec, jobs)
      }
      timed() // warmup (codegen caches; the engine's meta scans)
      val (rows, sec, jobs) = timed()
      println(f"[fanout] n=$n%5d rows=$rows ingest=$wSec%.1fs " +
        f"query=$sec%.2fs jobs=$jobs")
      // COMPOSED worst case (round 15): the three caps at once — capped
      // name regex (single-scan semi-join arm) × without(...) (the
      // all-keys label resolution: one semi-joined tag-keys job) ×
      // sliding range mode (per-step (T-w, T] windows). This is the
      // shape a dashboard's "all recording rules" panel issues; each cap
      // is pinned individually in MetricEngineSpec — this row measures
      // their composition staying flat in N.
      val qc = """sum without (host) (rate({__name__=~"fan_.*"}[10s]))"""
      val crange = graft.storage.TimeRange(
        1723680000000L, 1723680000000L + math.max(n, 10).toLong + 10000L)
      def timedComposed(): (Long, Double, Int) = {
        val group = s"fanout-c-$n-${System.nanoTime()}"
        spark.conf.set("graft.promql.rangeWindows", "sliding")
        spark.sparkContext.setJobGroup(group, "fanout composed probe")
        val t0 = System.nanoTime()
        val rows = try e.queryPromQL(qc, crange, Some(10000L)).count()
          finally {
            spark.sparkContext.clearJobGroup()
            spark.conf.unset("graft.promql.rangeWindows")
          }
        val sec = (System.nanoTime() - t0) / 1e9
        val jobs = spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).length
        (rows, sec, jobs)
      }
      timedComposed() // warmup
      val (crows, csec, cjobs) = timedComposed()
      println(f"[fanout] n=$n%5d composed(regex+without+sliding) " +
        f"rows=$crows query=$csec%.2fs jobs=$cjobs")
    } catch { case e: Throwable =>
      println(s"[fanout] n=$n FAILED: ${e.getMessage}")
    }
    spark.stop()
  }
}
