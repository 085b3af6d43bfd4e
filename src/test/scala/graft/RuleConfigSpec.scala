package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.server._

/** The Prometheus rules-file loader: the standard `groups:` YAML shape,
  * durations, quoting, comments, and loud rejection of everything outside
  * the documented subset. */
class RuleConfigSpec extends AnyFunSuite {

  private val full = """
# SLO rules
groups:
  - name: cpu.rules
    interval: 30s
    rules:
      - record: job:cpu:sum
        expr: sum by (job) (cpu)      # per-job totals
        labels:
          team: api
          tier: "gold"
      - alert: HighCpu
        expr: 'cpu{env="prod"} > 0.9'
        for: 10m
        keep_firing_for: 5m
        labels:
          severity: page
        annotations:
          summary: "cpu is high: {{ $value }}"
          runbook: https://wiki/runbooks/cpu
  - name: latency.rules
    rules:
      - alert: SlowRequests
        expr: histogram_quantile(0.99, sum by (le) (latency_bucket)) > 2
"""

  test("zero-indent block sequences parse: the common hand-written " +
      "Prometheus style where the dash sits at the parent key's column") {
    val zeroIndent = """
groups:
- name: cpu.rules
  interval: 30s
  rules:
  - record: job:cpu:sum
    expr: sum by (job) (cpu)
    labels:
      team: api
  - alert: HighCpu
    expr: cpu > 0.9
    for: 10m
- name: latency.rules
  rules:
  - record: lat:p99
    expr: histogram_quantile(0.99, sum by (le) (latency_bucket))
"""
    val groups = RuleConfig.parseYaml(zeroIndent)
    assert(groups.map(_.name) == Seq("cpu.rules", "latency.rules"))
    assert(groups(0).intervalMs == 30000L)
    val Seq(rec: RecordingRule, al: AlertingRule) = groups(0).rules
    assert(rec.record == "job:cpu:sum")
    assert(rec.labels == Map("team" -> "api"))
    assert(al.alert == "HighCpu")
    assert(al.forMs == 600000L)
    val Seq(rec2: RecordingRule) = groups(1).rules
    assert(rec2.record == "lat:p99")
  }

  test("full rules file parses to the exact rule model") {
    val groups = RuleConfig.parseYaml(full)
    assert(groups.map(_.name) == Seq("cpu.rules", "latency.rules"))
    assert(groups(0).intervalMs == 30000L)
    assert(groups(1).intervalMs == 60000L) // default

    val Seq(rec: RecordingRule, al: AlertingRule) = groups(0).rules
    assert(rec.record == "job:cpu:sum")
    assert(rec.expr == "sum by (job) (cpu)")
    assert(rec.labels == Map("team" -> "api", "tier" -> "gold"))

    assert(al.alert == "HighCpu")
    assert(al.expr == """cpu{env="prod"} > 0.9""")
    assert(al.forMs == 600000L)
    assert(al.keepFiringForMs == 300000L)
    assert(al.labels == Map("severity" -> "page"))
    assert(al.annotations == Map(
      "summary" -> "cpu is high: {{ $value }}",
      "runbook" -> "https://wiki/runbooks/cpu"))

    val Seq(slow: AlertingRule) = groups(1).rules
    assert(slow.forMs == 0L && slow.keepFiringForMs == 0L)
    assert(slow.expr.startsWith("histogram_quantile(0.99"))
  }

  test("parsed config drives the PromQL parser: every expr is valid") {
    RuleConfig.parseYaml(full).flatMap(_.rules).foreach(r =>
      graft.promql.PromQLParser.parse(r.expr))
  }

  test("durations: compound, bare seconds, units; bad ones throw") {
    assert(RuleConfig.durationMs("90") == 90000L)
    assert(RuleConfig.durationMs("1h30m") == 5400000L)
    assert(RuleConfig.durationMs("250ms") == 250L)
    assert(RuleConfig.durationMs("2w") == 14L * 86400000L)
    intercept[IllegalArgumentException](RuleConfig.durationMs("10 m"))
    intercept[IllegalArgumentException](RuleConfig.durationMs("m10"))
    intercept[IllegalArgumentException](RuleConfig.durationMs(""))
  }

  test("structure errors are loud and name the problem") {
    def bad(yaml: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](RuleConfig.parseYaml(yaml))
      assert(e.getMessage.contains(needle), s"'${e.getMessage}' !~ '$needle'")
    }
    bad("rules:\n  - record: x\n    expr: y", "groups")
    bad("groups:\n  - interval: 30s\n    rules:\n      - record: x\n        expr: y",
      "missing 'name'")
    bad("groups:\n  - name: g\n    rules:\n      - expr: y", "'record' or 'alert'")
    bad("groups:\n  - name: g\n    rules:\n      - record: x\n        alert: z\n        expr: y",
      "both")
    bad("groups:\n  - name: g\n    rules:\n      - record: x\n        expr: y\n        for: 5m",
      "must not set 'for'")
    // rule-model validation surfaces through the loader
    bad("groups:\n  - name: g\n    rules:\n      - record: \"bad name\"\n        expr: y",
      "invalid recording-rule metric name")
  }

  test("unsupported YAML is rejected, never misparsed") {
    def bad(yaml: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException](RuleConfig.parseYaml(yaml))
      assert(e.getMessage.contains(needle), s"'${e.getMessage}' !~ '$needle'")
    }
    bad("groups:\n\t- name: g", "tabs")
    bad("groups: [a, b]", "flow style")
    bad("groups:\n  - name: g\n    rules:\n      - record: x\n        expr: |\n          sum(cpu)",
      "multi-line")
    bad("groups:\n  - name: &anchor g", "anchors")
  }

  test("quoting: single quotes keep $ and {{ }}; doubled single quote " +
      "escapes; double quotes process escapes; # inside quotes survives") {
    val g = RuleConfig.parseYaml(
      """groups:
        |  - name: g
        |    rules:
        |      - record: x:y
        |        expr: 'vector(1)'
        |        labels:
        |          a: 'it''s'
        |          b: "tab\there"
        |          c: "color #5"
        |""".stripMargin)
    val r = g.head.rules.head.asInstanceOf[RecordingRule]
    assert(r.labels == Map("a" -> "it's", "b" -> "tab\there", "c" -> "color #5"))
  }
}
