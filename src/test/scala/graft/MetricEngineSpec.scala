package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.metric._
import graft.storage.TimeRange

/** Mirrors the RFC worked example (docs/rfcs/20240827-metric-engine.md:140-179):
  * two http_requests series over labels url/code/job → 1 metrics row,
  * 2 series rows, 6 tags rows, 6 index rows; plus the two-step read path. */
class MetricEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def engine(): MetricEngine =
    new MetricEngine(spark, Files.createTempDirectory("graft-metric").toString,
      segmentMs = 12L * 3600 * 1000)

  private val day = 1723680000000L // 2024-08-15 epoch ms

  private def rfcSamples = {
    import spark.implicits._
    Seq(
      Sample("http_requests",
        Map("url" -> "/api/put", "code" -> "200", "job" -> "proxy"), day, 100.0),
      Sample("http_requests",
        Map("url" -> "/api/query", "code" -> "200", "job" -> "proxy"), day, 10.0)
    ).toDF()
  }

  test("ingest populates the RFC table cardinalities") {
    val e = engine()
    e.write(rfcSamples)
    assert(e.metrics.scan().count() == 1)
    assert(e.series.scan().count() == 2)
    assert(e.tags.scan().count() == 4)   // distinct (key,value): 2 urls + code + job
    assert(e.index.scan().count() == 6)
    assert(e.data.scan().count() == 2)
  }

  test("two-step label lookup narrows to the right series") {
    val e = engine()
    e.write(rfcSamples)
    val got = e.query(MetricQuery("http_requests",
      labelFilters = Map("url" -> "/api/put"))).collect()
    assert(got.length == 1 && got(0).getDouble(0) == 100.0)
    // AND of two labels — one matching, one not
    val none = e.query(MetricQuery("http_requests",
      labelFilters = Map("url" -> "/api/put", "code" -> "500"))).collect()
    assert(none.head.isNullAt(0) || none.isEmpty) // sum over empty set
  }

  test("group-by-tag aggregation (sum by url)") {
    val e = engine()
    e.write(rfcSamples)
    val got = e.query(MetricQuery("http_requests", groupByTag = Some("url")))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("/api/put" -> 100.0, "/api/query" -> 10.0))
  }

  test("TSID joins broadcast only while small (SURVEY §2.3 adaptive hint)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hintCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    val e = engine()
    e.write(rfcSamples)
    val q = MetricQuery("http_requests",
      labelFilters = Map("url" -> "/api/put"), groupByTag = Some("url"))
    val hinted = e.query(q)
    assert(hintCount(hinted) > 0, "small TSID sets should carry the broadcast hint")
    spark.conf.set("graft.metric.broadcastMaxBytes", "0")
    try {
      // over-cap: no hint — the join shape is AQE's call, never a forced
      // driver collect of an unbounded TSID set
      val unhinted = e.query(q)
      assert(hintCount(unhinted) == 0)
      assert(unhinted.collect().toSet == hinted.collect().toSet)
    } finally spark.conf.unset("graft.metric.broadcastMaxBytes")
  }

  test("bucketed data-table ingest: N SSTs per segment, queries unchanged") {
    import spark.implicits._
    val many = (1 to 64).map(i =>
      Sample("http_requests", Map("url" -> s"/api/$i"), day, i.toDouble)).toDF()
    val single = engine()
    single.write(many)
    val bucketed = new MetricEngine(spark,
      Files.createTempDirectory("graft-metric").toString,
      segmentMs = 12L * 3600 * 1000, dataBuckets = 4)
    bucketed.write(many)
    assert(bucketed.data.manifest.allSsts().size == 4) // one segment, 4 buckets
    assert(single.data.manifest.allSsts().size == 1)
    val q = MetricQuery("http_requests", groupByTag = Some("url"))
    def run(e: MetricEngine) =
      e.query(q).collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(run(bucketed) == run(single))
  }

  test("last-write-wins on duplicate (series, ts) across writes") {
    import spark.implicits._
    val e = engine()
    e.write(rfcSamples)
    e.write(Seq(Sample("http_requests",
      Map("url" -> "/api/put", "code" -> "200", "job" -> "proxy"), day, 777.0)).toDF())
    val got = e.query(MetricQuery("http_requests",
      labelFilters = Map("url" -> "/api/put"))).collect()
    assert(got(0).getDouble(0) == 777.0)
  }

  test("rate over a counter series with reset") {
    import spark.implicits._
    val e = engine()
    val base = day
    val counter = Seq(10.0, 20.0, 35.0, 5.0, 12.0).zipWithIndex.map { case (v, i) =>
      Sample("reqs_total", Map("job" -> "api"), base + i * 1000L, v)
    }
    e.write(counter.toDF())
    // increase = 10 + 15 + 5(reset: full value) + 7 = 37
    val got = e.query(MetricQuery("reqs_total", agg = MetricAgg.Sum, rate = true))
      .collect()
    assert(got(0).getDouble(0) == 37.0)
  }

  test("time-range query prunes to the requested window") {
    import spark.implicits._
    val e = engine()
    val samples = (0 until 10).map(i =>
      Sample("m", Map("k" -> "v"), day + i * 60000L, i.toDouble))
    e.write(samples.toDF())
    val got = e.query(MetricQuery("m", agg = MetricAgg.Count,
      range = TimeRange(day, day + 5 * 60000L))).collect()
    assert(got(0).getDouble(0) == 5.0)
  }
}
