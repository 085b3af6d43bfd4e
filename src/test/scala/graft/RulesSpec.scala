package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.metric.{MetricEngine, Sample}
import graft.server.{AlertingRule, HttpFrontend, RecordingRule, RuleEngine, RuleGroup}

/** Recording / alerting rules over the metric engine: instant evaluation,
  * write-back, the pending→firing→resolved state machine, the ALERTS /
  * ALERTS_FOR_STATE synthetic series, and the Prometheus rules/alerts/tsdb
  * HTTP surface. */
class RulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val t0 = 1723680000000L // 2024-08-15T00:00:00Z
  private val http = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  /** cpu{host=h0}=1 @T-10s, cpu{host=h1}=2 @T-20s, cpu{host=h2}=5 @T-400s
    * (outside the 5 m lookback at T). */
  private def freshEngine(): MetricEngine = {
    val eng = new MetricEngine(spark,
      Files.createTempDirectory("graft-rules").toString)
    eng.write(spark.createDataFrame(Seq(
      Sample("cpu", Map("host" -> "h0"), t0 - 10000L, 1.0),
      Sample("cpu", Map("host" -> "h1"), t0 - 20000L, 2.0),
      Sample("cpu", Map("host" -> "h2"), t0 - 400000L, 5.0))))
    eng
  }

  private def valuesByLabel(df: org.apache.spark.sql.DataFrame,
      label: String): Map[String, Double] =
    df.collect().map(r =>
      r.getAs[String](label) -> r.getAs[Double]("value")).toMap

  test("recording rule: instant eval writes the result back under the new " +
      "metric name, stale series drop out, static labels overlay") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      RecordingRule("job:cpu:sum", "sum by (host) (cpu)",
        labels = Map("tier" -> "gold"))))))
    re.evalGroupOnce("g", t0)

    val out = eng.instantPromQLLabeled("job:cpu:sum", t0)
    assert(valuesByLabel(out, "host") == Map("h0" -> 1.0, "h1" -> 2.0)) // h2 stale
    // the static label rides on every recorded series
    assert(out.collect().forall(_.getAs[String]("tier") == "gold"))
    // recorded under the rule's name, not the source metric's
    assert(eng.instantPromQLLabeled("""{__name__="job:cpu:sum"}""", t0)
      .count() == 2)
  }

  test("recording rule over UTF-8 label names (round 15): a dotted OTLP " +
      "attribute groups via the quoted by-list, records under the rule " +
      "name with the dotted label, and reads back grouped by it") {
    val eng = new MetricEngine(spark,
      Files.createTempDirectory("graft-rules-utf8").toString)
    eng.write(spark.createDataFrame(Seq(
      Sample("req", Map("service.name" -> "api", "host.name" -> "h1"),
        t0 - 10000L, 4.0),
      Sample("req", Map("service.name" -> "api", "host.name" -> "h2"),
        t0 - 20000L, 6.5),
      Sample("req", Map("service.name" -> "worker", "host.name" -> "h1"),
        t0 - 10000L, 1.25))))
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      RecordingRule("svc:req:sum",
        """sum by ("service.name") (req)""")))))
    re.evalGroupOnce("g", t0)
    val out = eng.instantPromQLLabeled("svc:req:sum", t0)
    assert(out.columns.contains("service.name"))
    assert(valuesByLabel(out, "service.name")
      == Map("api" -> 10.5, "worker" -> 1.25))
    // and the recorded series stay addressable by the dotted label
    val filtered = eng.instantPromQLLabeled(
      """svc:req:sum{"service.name"="api"}""", t0)
    assert(valuesByLabel(filtered, "service.name") == Map("api" -> 10.5))
  }

  test("rules in one group evaluate sequentially: a later rule sees an " +
      "earlier recording rule's output at the same evaluation time") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      RecordingRule("cpu:doubled", "cpu * 2"),
      RecordingRule("cpu:doubled:sum", "sum(cpu:doubled)")))))
    re.evalGroupOnce("g", t0)
    val out = eng.instantPromQLLabeled("cpu:doubled:sum", t0).collect()
    assert(out.length == 1 && out(0).getAs[Double]("value") == 6.0) // (1+2)*2
  }

  test("alerting rule: pending after `for` admission, firing once held, " +
      "resolved when the expression clears; ALERTS/ALERTS_FOR_STATE written") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      AlertingRule("HighCpu", "cpu > 1.5", forMs = 60000L,
        labels = Map("severity" -> "page"),
        annotations = Map("summary" -> "cpu high"))))))

    re.evalGroupOnce("g", t0)
    val pending = re.activeAlerts("g", 0)
    assert(pending.map(_.state) == Seq("pending"))
    assert(pending.head.labels == Map("alertname" -> "HighCpu",
      "host" -> "h1", "severity" -> "page"))
    assert(re.ruleState("g", 0) == "pending")
    // the synthetic series carries the pending state at T
    assert(valuesByLabel(eng.instantPromQLLabeled(
      """ALERTS{alertstate="pending"}""", t0), "host") == Map("h1" -> 1.0))

    // still active 70 s later -> held past `for`, fires
    re.evalGroupOnce("g", t0 + 70000L)
    val firing = re.activeAlerts("g", 0)
    assert(firing.map(_.state) == Seq("firing"))
    assert(firing.head.activeAtMs == t0)
    assert(valuesByLabel(eng.instantPromQLLabeled(
      """ALERTS{alertstate="firing"}""", t0 + 70000L), "host") == Map("h1" -> 1.0))
    // ALERTS_FOR_STATE restores activeAt (seconds), no alertstate label
    val forState = eng.instantPromQLLabeled("ALERTS_FOR_STATE", t0 + 70000L)
    assert(valuesByLabel(forState, "host") == Map("h1" -> t0 / 1000.0))

    // every sample is stale at T+400 s -> expression empty -> resolved
    re.evalGroupOnce("g", t0 + 400000L)
    assert(re.activeAlerts("g", 0).isEmpty)
    assert(re.ruleState("g", 0) == "inactive")
  }

  test("keep_firing_for holds a firing alert past its last active " +
      "evaluation; a pending alert drops immediately") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      AlertingRule("Sticky", "cpu > 1.5", forMs = 0L,
        keepFiringForMs = 600000L),
      AlertingRule("Fleeting", "cpu > 0.5", forMs = 3600000L)))))
    re.evalGroupOnce("g", t0) // Sticky fires (for=0); Fleeting pending
    assert(re.activeAlerts("g", 0).map(_.state) == Seq("firing"))
    assert(re.activeAlerts("g", 1).map(_.state) == Seq("pending", "pending"))

    re.evalGroupOnce("g", t0 + 400000L) // both expressions now empty
    assert(re.activeAlerts("g", 0).map(_.state) == Seq("firing")) // 400s < 600s
    assert(re.activeAlerts("g", 1).isEmpty)

    re.evalGroupOnce("g", t0 + 700000L) // past keep_firing_for
    assert(re.activeAlerts("g", 0).isEmpty)
  }

  test("a failing rule records err health with the message and the group " +
      "continues to later rules") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      RecordingRule("bad:rule", "sum by (host (cpu"),
      RecordingRule("good:rule", "sum(cpu)")))))
    re.evalGroupOnce("g", t0)
    assert(re.healthOf("g", 0).health == "err")
    assert(re.healthOf("g", 0).lastError.get.nonEmpty)
    assert(re.healthOf("g", 1).health == "ok")
    assert(eng.instantPromQLLabeled("good:rule", t0).count() == 1)
  }

  test("result cap: a rule whose vector exceeds maxSamplesPerRule fails " +
      "that evaluation instead of buffering it") {
    val eng = freshEngine()
    val re = new RuleEngine(spark, eng, Seq(RuleGroup("g", 60000L, Seq(
      RecordingRule("too:big", "cpu")))), maxSamplesPerRule = 1)
    re.evalGroupOnce("g", t0)
    assert(re.healthOf("g", 0).health == "err")
    assert(re.healthOf("g", 0).lastError.get.contains("exceeds"))
  }

  test("restart restore: a new RuleEngine over the same store resumes " +
      "firing alerts with their ORIGINAL activeAt from ALERTS_FOR_STATE") {
    val eng = freshEngine()
    val groups = Seq(RuleGroup("g", 60000L, Seq(
      AlertingRule("HighCpu", "cpu > 1.5", forMs = 60000L))))
    val re1 = new RuleEngine(spark, eng, groups)
    re1.evalGroupOnce("g", t0)
    re1.evalGroupOnce("g", t0 + 70000L)
    assert(re1.activeAlerts("g", 0).map(_.state) == Seq("firing"))

    // "restart": fresh engine instance, no in-memory state
    val re2 = new RuleEngine(spark, eng, groups)
    assert(re2.activeAlerts("g", 0).isEmpty)
    re2.restoreAlertState(t0 + 100000L)
    val restored = re2.activeAlerts("g", 0)
    assert(restored.map(_.state) == Seq("firing"))
    assert(restored.head.activeAtMs == t0) // original clock, not restarted
    assert(restored.head.labels("host") == "h1")

    // the next evaluation is authoritative: still active -> stays firing
    // with the original activeAt and a refreshed value
    re2.evalGroupOnce("g", t0 + 130000L)
    val after = re2.activeAlerts("g", 0)
    assert(after.map(_.state) == Seq("firing"))
    assert(after.head.activeAtMs == t0 && after.head.value == 2.0)

    // restore over a store with no alert series yet is a silent no-op
    val empty = new MetricEngine(spark,
      Files.createTempDirectory("graft-rules-empty").toString)
    val re3 = new RuleEngine(spark, empty, groups)
    re3.restoreAlertState(t0)
    assert(re3.activeAlerts("g", 0).isEmpty)
  }

  test("annotation templates: $value and $labels expand, absent labels " +
      "empty, unknown expressions stay verbatim") {
    val t = RuleEngine.expandTemplate(
      "host {{ $labels.host }} at {{$value}}; gone={{ $labels.nope }}; " +
        "raw {{ humanize $value }}",
      Map("host" -> "h1"), 2.5)
    assert(t == "host h1 at 2.5; gone=; raw {{ humanize $value }}")
  }

  test("HTTP: /api/v1/rules and /api/v1/alerts render the Prometheus " +
      "shapes; probes and tsdb status answer") {
    val eng = freshEngine()
    val fe = new HttpFrontend(spark, eng, rules = Seq(RuleGroup("serving",
      30000L, Seq(
        RecordingRule("job:cpu:sum", "sum by (host) (cpu)"),
        AlertingRule("HighCpu", "cpu > 1.5", forMs = 0L,
          annotations = Map("summary" -> "cpu is high"))))))
    val port = fe.start()
    try {
      fe.ruleEngine.get.evalGroupOnce("serving", t0)

      val rules = get(port, "/api/v1/rules")
      assert(rules.statusCode() == 200)
      val rb = rules.body()
      assert(rb.contains(""""status":"success""""))
      assert(rb.contains(""""name":"serving""""))
      assert(rb.contains(""""type":"recording""""))
      assert(rb.contains(""""name":"job:cpu:sum""""))
      assert(rb.contains(""""type":"alerting""""))
      assert(rb.contains(""""state":"firing""""))
      assert(rb.contains(""""health":"ok""""))
      assert(rb.contains(""""summary":"cpu is high""""))

      // type filter: record / alert partition the same groups
      val recOnly = get(port, "/api/v1/rules?type=record").body()
      assert(recOnly.contains("job:cpu:sum") && !recOnly.contains("HighCpu"))
      val alOnly = get(port, "/api/v1/rules?type=alert").body()
      assert(!alOnly.contains("job:cpu:sum") && alOnly.contains("HighCpu"))
      assert(get(port, "/api/v1/rules?type=bogus").statusCode() == 400)

      val alerts = get(port, "/api/v1/alerts")
      assert(alerts.statusCode() == 200)
      assert(alerts.body().contains(""""alertname":"HighCpu""""))
      assert(alerts.body().contains(""""host":"h1""""))
      assert(alerts.body().contains(s""""activeAt":"2024-08-15T00:00:00Z""""))

      assert(get(port, "/-/healthy").statusCode() == 200)
      assert(get(port, "/-/ready").statusCode() == 200)

      // /metrics self-telemetry: exposition format, request counters,
      // rule counters (2 rules evaluated once)
      get(port, "/api/v1/rules") // ensure the handler counter is > 1
      val sm = get(port, "/metrics")
      assert(sm.statusCode() == 200)
      assert(sm.headers().firstValue("Content-Type").orElse("")
        .startsWith("text/plain; version=0.0.4"))
      // 5 = the plain get, 3 type-filter gets, and the pre-/metrics get
      assert(sm.body().contains("""graft_http_requests_total{handler="/api/v1/rules"} 5"""))
      // >= 2: our explicit evalGroupOnce, plus whatever the live
      // scheduler has run at wall-clock times (expressions evaluate
      // empty there, but they count)
      val evals = "graft_rule_evaluations_total ([0-9]+)".r
        .findFirstMatchIn(sm.body()).get.group(1).toLong
      assert(evals >= 2, sm.body())
      assert(sm.body().contains("graft_rule_evaluation_failures_total 0"))
      assert(sm.body().contains("graft_ingest_enabled 1"))
      assert(sm.body().contains("process_start_time_seconds "))

      val tsdb = get(port, "/api/v1/status/tsdb")
      assert(tsdb.statusCode() == 200)
      val tb = tsdb.body()
      // 3 cpu series + the rule-written job:cpu:sum (2) and ALERTS/
      // ALERTS_FOR_STATE series (1+1) = 7
      assert(tb.contains(""""numSeries":7"""))
      assert(tb.contains(""""seriesCountByMetricName""""))
      assert(tb.contains(""""name":"cpu","value":3"""))
      assert(tb.contains(""""name":"host""""))
    } finally fe.stop()
  }
}
