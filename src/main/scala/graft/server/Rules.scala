package graft.server

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

import graft.metric.{MetricEngine, Sample}

/** Prometheus-shaped recording / alerting rules evaluated against the
  * metric engine — the serving-side feature every Prometheus deployment
  * turns on next after queries (beyond the reference, whose server has no
  * rule evaluation; the surface follows the public Prometheus rule config
  * and `/api/v1/rules` / `/api/v1/alerts` contracts).
  *
  * Each rule holds one PromQL expression evaluated as an INSTANT query at
  * the group's cadence ([[MetricEngine.instantPromQLLabeled]], so results
  * carry decoded label columns). Recording rules write their result back
  * into the engine under a new metric name; alerting rules drive a
  * pending→firing state machine and write the standard `ALERTS` /
  * `ALERTS_FOR_STATE` synthetic series.
  *
  * Scale: the heavy work (the PromQL evaluation) is a distributed Spark
  * job like any query; only the rule RESULT crosses the driver — bounded
  * by `maxSamplesPerRule` (recording rules are aggregations by design,
  * Prometheus buffers the same vector in its rule manager). Alert state
  * is one driver map entry per active (rule, labelset) — human-consumed
  * cardinality, guarded by the same cap.
  */
sealed trait Rule {
  def name: String
  def expr: String
  def labels: Map[String, String]
}

/** `record:` rule — evaluates `expr` and writes the result as metric
  * `record` (the `__name__` of the result is replaced; static `labels`
  * overlay the result's own). */
final case class RecordingRule(record: String, expr: String,
    labels: Map[String, String] = Map.empty) extends Rule {
  require(record.matches("[a-zA-Z_:][a-zA-Z0-9_:]*"),
    s"invalid recording-rule metric name: '$record'")
  def name: String = record
}

/** `alert:` rule — rows returned by `expr` (after comparison filtering)
  * are active alerts; an alert fires once continuously active for
  * `forMs`, and keeps firing `keepFiringForMs` past its last active
  * evaluation (Prometheus `for:` / `keep_firing_for:`). */
final case class AlertingRule(alert: String, expr: String, forMs: Long = 0L,
    keepFiringForMs: Long = 0L, labels: Map[String, String] = Map.empty,
    annotations: Map[String, String] = Map.empty) extends Rule {
  require(alert.nonEmpty, "alert name must be non-empty")
  require(forMs >= 0, s"for must be >= 0 ms, got $forMs")
  require(keepFiringForMs >= 0,
    s"keep_firing_for must be >= 0 ms, got $keepFiringForMs")
  def name: String = alert
}

/** One evaluation group: rules evaluate SEQUENTIALLY at each tick (so a
  * later rule sees an earlier recording rule's output, Prometheus group
  * semantics), groups are independent. */
final case class RuleGroup(name: String, intervalMs: Long = 60000L,
    rules: Seq[Rule]) {
  require(name.nonEmpty, "group name must be non-empty")
  require(intervalMs > 0, s"interval must be positive, got $intervalMs")
}

object RuleEngine {
  /** Expand the template subset Prometheus alert annotations actually
    * use: `{{ $value }}` and `{{ $labels.<name> }}` (whitespace-tolerant).
    * Anything else between braces is left verbatim — a full Go-template
    * engine is out of scope and a silent empty expansion would hide the
    * mistake; an absent label expands to "" (Prometheus semantics). */
  def expandTemplate(tpl: String, labels: Map[String, String],
      value: Double): String = {
    val re = """\{\{\s*\$(value|labels\.([a-zA-Z_][a-zA-Z0-9_]*))\s*\}\}""".r
    re.replaceAllIn(tpl, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (m.group(1) == "value") value.toString
        else labels.getOrElse(m.group(2), "")))
  }

  /** One active alert instance (a distinct labelset of one alerting rule).
    * `firingSinceMs` empty = pending. `lastActiveMs` is the newest
    * evaluation at which the expression still returned this labelset —
    * `keep_firing_for` measures from here. */
  final case class AlertInstance(labels: Map[String, String], value: Double,
      activeAtMs: Long, firingSinceMs: Option[Long], lastActiveMs: Long) {
    def state: String = if (firingSinceMs.isDefined) "firing" else "pending"
  }

  /** Per-rule evaluation health for the API (`health`: ok / err / unknown
    * like Prometheus; unknown = never evaluated). */
  final case class RuleHealth(lastEvalMs: Long = 0L, durationMs: Long = 0L,
      lastError: Option[String] = None) {
    def health: String =
      if (lastEvalMs == 0L) "unknown"
      else if (lastError.isDefined) "err" else "ok"
  }
}

final class RuleEngine(
    spark: SparkSession,
    engine: MetricEngine,
    val groups: Seq[RuleGroup],
    /** Instant-query lookback delta for rule expressions (Prometheus
      * `--query.lookback-delta`). */
    lookbackMs: Long = 300000L,
    /** Driver-side result cap per rule evaluation: a rule whose vector
      * exceeds it fails that evaluation (health `err`) instead of
      * buffering an unbounded collect in the serving JVM — recording a
      * raw million-series selector is a misconfiguration, not a workload. */
    maxSamplesPerRule: Int = 100000,
    /** Serializes engine writes with the caller's other writers (the HTTP
      * frontend passes its ingest lock — the manifest is single-writer by
      * design). */
    writeLock: AnyRef = new Object) {
  require(lookbackMs > 0, s"lookbackMs must be positive, got $lookbackMs")
  require(maxSamplesPerRule > 0,
    s"maxSamplesPerRule must be positive, got $maxSamplesPerRule")
  private val groupNames = groups.map(_.name)
  require(groupNames.distinct.length == groupNames.length,
    "duplicate rule-group names: " +
      groupNames.diff(groupNames.distinct).mkString(", "))

  import RuleEngine._

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[RuleEngine])

  /** Alert state, keyed (group, ruleIdx, label fingerprint). Guarded by
    * `stateLock`; bounded by maxSamplesPerRule per rule. */
  private val alertState =
    scala.collection.mutable.Map.empty[(String, Int, String), AlertInstance]
  private val ruleHealth =
    scala.collection.mutable.Map.empty[(String, Int), RuleHealth]
  private val groupLastEval =
    scala.collection.mutable.Map.empty[String, Long]
  private val stateLock = new Object

  // self-telemetry behind the frontend's /metrics endpoint
  private val evalCount = new java.util.concurrent.atomic.LongAdder
  private val evalFailCount = new java.util.concurrent.atomic.LongAdder
  def evaluationsTotal: Long = evalCount.sum()
  def evaluationFailuresTotal: Long = evalFailCount.sum()

  /** Columns of a labeled instant frame that are NOT labels. `__name__`
    * is dropped too: a recording rule REPLACES the metric name, and an
    * alert's identity labels follow the same convention (Prometheus
    * drops `__name__` through comparisons feeding alerts only on
    * aggregation — we document the uniform drop; the alertname label is
    * the alert's identity anyway). */
  private val structuralCols = Set("value", "ts_ms", "bucket_ms", "tsid", "__name__")

  /** Evaluate one rule expression to (labelset, value) pairs at `nowMs` —
    * the driver-bounded materialization point. */
  private def evalExpr(expr: String, nowMs: Long,
      lookback: Long = lookbackMs): Seq[(Map[String, String], Double)] = {
    val df = engine.instantPromQLLabeled(expr, nowMs, lookback)
    val labelCols = df.columns.filterNot(structuralCols.contains).toSeq.sorted
    val valueIdx = df.columns.indexOf("value")
    val rows = df.limit(maxSamplesPerRule + 1).collect()
    if (rows.length > maxSamplesPerRule)
      throw new IllegalStateException(
        s"rule result exceeds $maxSamplesPerRule samples; refusing to buffer " +
          "an unbounded vector on the driver (raise maxSamplesPerRule if intended)")
    rows.toSeq.filter(r => !r.isNullAt(valueIdx)).map { r =>
      val labels = labelCols.flatMap { c =>
        Option(r.getAs[Any](c)).map(_.toString).filter(_.nonEmpty).map(c -> _)
      }.toMap
      (labels, r.getAs[Double]("value"))
    }
  }

  private def writeSamples(samples: Seq[Sample]): Unit =
    if (samples.nonEmpty) writeLock.synchronized {
      engine.write(spark.createDataFrame(samples))
    }

  /** Evaluate every rule of `group` at `nowMs` (sequential, Prometheus
    * group semantics; a failed rule records `err` health and the group
    * continues). Public and deterministic — tests and the scheduler share
    * it. */
  def evalGroup(group: RuleGroup, nowMs: Long): Unit = {
    group.rules.zipWithIndex.foreach { case (rule, idx) =>
      val t0 = System.nanoTime()
      try {
        rule match {
          case r: RecordingRule =>
            val out = evalExpr(r.expr, nowMs)
            writeSamples(out.map { case (labels, v) =>
              Sample(r.record, labels ++ r.labels, nowMs, v)
            })
          case a: AlertingRule =>
            evalAlert(group.name, idx, a, nowMs)
        }
        evalCount.increment()
        stateLock.synchronized {
          ruleHealth((group.name, idx)) = RuleHealth(nowMs,
            (System.nanoTime() - t0) / 1000000L, None)
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.warn(s"rule '${rule.name}' (group '${group.name}') failed", e)
          evalCount.increment()
          evalFailCount.increment()
          stateLock.synchronized {
            ruleHealth((group.name, idx)) = RuleHealth(nowMs,
              (System.nanoTime() - t0) / 1000000L,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
          }
      }
    }
    stateLock.synchronized { groupLastEval(group.name) = nowMs }
  }

  /** Evaluate a named group once at `nowMs` — the deterministic test /
    * backfill entry. */
  def evalGroupOnce(groupName: String, nowMs: Long): Unit =
    evalGroup(groups.find(_.name == groupName).getOrElse(
      throw new NoSuchElementException(s"no rule group '$groupName'")), nowMs)

  /** Stable fingerprint of a labelset (same canonical key the engine's
    * series ids use — control separators can't occur in label text). */
  private def fingerprint(labels: Map[String, String]): String =
    labels.toSeq.sorted.map { case (k, v) => k + "\u0001" + v }.mkString("\u0002")

  private def evalAlert(groupName: String, ruleIdx: Int, rule: AlertingRule,
      nowMs: Long): Unit = {
    val active = evalExpr(rule.expr, nowMs).map { case (labels, v) =>
      val full = labels ++ rule.labels + ("alertname" -> rule.alert)
      (fingerprint(full), (full, v))
    }.toMap

    val toWrite = stateLock.synchronized {
      val keyPrefix = (groupName, ruleIdx)
      // advance / admit active labelsets
      active.foreach { case (fp, (labels, v)) =>
        val key = (groupName, ruleIdx, fp)
        alertState.get(key) match {
          case None =>
            alertState(key) = AlertInstance(labels, v, nowMs,
              if (rule.forMs == 0L) Some(nowMs) else None, nowMs)
          case Some(st) =>
            val firing = st.firingSinceMs.orElse(
              if (nowMs - st.activeAtMs >= rule.forMs) Some(nowMs) else None)
            alertState(key) = st.copy(value = v, firingSinceMs = firing,
              lastActiveMs = nowMs)
        }
      }
      // retire inactive ones: pending drop immediately; firing linger
      // keep_firing_for past their last active evaluation
      alertState.filterInPlace { case ((g, i, fp), st) =>
        (g, i) != keyPrefix || active.contains(fp) || (
          st.firingSinceMs.isDefined &&
            nowMs - st.lastActiveMs < rule.keepFiringForMs)
      }
      alertState.collect {
        case ((g, i, _), st) if (g, i) == keyPrefix => st
      }.toSeq
    }

    // the standard synthetic series, stamped at this evaluation: ALERTS=1
    // per active alert with its state label; ALERTS_FOR_STATE = activeAt
    // seconds (Prometheus's restore-from-storage series, no alertstate
    // label)
    writeSamples(toWrite.flatMap { st =>
      Seq(
        Sample("ALERTS", st.labels + ("alertstate" -> st.state), nowMs, 1.0),
        Sample("ALERTS_FOR_STATE", st.labels, nowMs, st.activeAtMs / 1000.0))
    })
  }

  /** Restore alert state after a restart from the persisted
    * `ALERTS_FOR_STATE` series (the reason that series exists — the
    * Prometheus restore-from-storage mechanism): for every alerting
    * rule, each series' newest sample within `outageToleranceMs`
    * (Prometheus `--rules.alert.for-outage-tolerance`, 1 h default)
    * seeds an instance with its ORIGINAL activeAt (the sample value, in
    * epoch seconds), so a `for: 24h` alert doesn't restart its clock on
    * every deploy. Already-present instances are never overwritten; a
    * rule whose restore query fails (e.g. a store with no alert series
    * yet) is skipped silently — restoration is best-effort, the next
    * evaluation is authoritative. Restored values render as NaN until
    * that evaluation refreshes them. Call before [[start]]. */
  def restoreAlertState(nowMs: Long,
      outageToleranceMs: Long = 3600000L): Unit = {
    require(outageToleranceMs > 0,
      s"outageToleranceMs must be positive, got $outageToleranceMs")
    groups.foreach { g =>
      g.rules.zipWithIndex.foreach {
        case (rule: AlertingRule, idx) =>
          val sel = "ALERTS_FOR_STATE{alertname=\"" +
            rule.alert.replace("\\", "\\\\").replace("\"", "\\\"") + "\"}"
          val rows = scala.util.Try(
            evalExpr(sel, nowMs, lookback = outageToleranceMs))
            .getOrElse(Nil)
          stateLock.synchronized {
            rows.foreach { case (labels, activeAtSec) =>
              val key = (g.name, idx, fingerprint(labels))
              if (!alertState.contains(key)) {
                val activeAt = (activeAtSec * 1000.0).toLong
                val firing =
                  if (nowMs - activeAt >= rule.forMs) Some(activeAt + rule.forMs)
                  else None
                alertState(key) = AlertInstance(labels, Double.NaN,
                  activeAt, firing, nowMs)
              }
            }
          }
        case _ => ()
      }
    }
  }

  /** Active alerts of one rule (API rendering + tests). */
  def activeAlerts(groupName: String, ruleIdx: Int): Seq[AlertInstance] =
    stateLock.synchronized {
      alertState.collect {
        case ((g, i, _), st) if g == groupName && i == ruleIdx => st
      }.toSeq.sortBy(a => fingerprint(a.labels))
    }

  /** All active alerts (the `/api/v1/alerts` payload). */
  def allAlerts(): Seq[AlertInstance] =
    stateLock.synchronized {
      alertState.values.toSeq.sortBy(a => fingerprint(a.labels))
    }

  def healthOf(groupName: String, ruleIdx: Int): RuleHealth =
    stateLock.synchronized {
      ruleHealth.getOrElse((groupName, ruleIdx), RuleHealth())
    }

  def lastEvalOf(groupName: String): Long =
    stateLock.synchronized { groupLastEval.getOrElse(groupName, 0L) }

  /** Aggregate state of an alerting rule for the API: firing > pending >
    * inactive. */
  def ruleState(groupName: String, ruleIdx: Int): String = {
    val alerts = activeAlerts(groupName, ruleIdx)
    if (alerts.exists(_.state == "firing")) "firing"
    else if (alerts.nonEmpty) "pending" else "inactive"
  }

  // ---- scheduler ----------------------------------------------------

  private val running = new AtomicBoolean(false)
  @volatile private var thread: Option[Thread] = None

  /** Start the evaluation loop: one daemon thread, each group on its own
    * cadence (due = last eval + interval). Evaluations of different
    * groups run back-to-back on this thread — rule evaluation is a Spark
    * job, the thread just drives it. */
  def start(): Unit = if (groups.nonEmpty && running.compareAndSet(false, true)) {
    // (empty groups: no-op — the loop below computes min over per-group
    // due times, which would throw on an empty map and kill the thread)
    val nextDue = scala.collection.mutable.Map.empty[String, Long]
    val t = new Thread(() => {
      try while (running.get()) {
        val now = System.currentTimeMillis()
        groups.foreach { g =>
          if (now >= nextDue.getOrElse(g.name, 0L)) {
            nextDue(g.name) = now + g.intervalMs
            try evalGroup(g, now)
            catch {
              case scala.util.control.NonFatal(e) =>
                log.warn(s"rule group '${g.name}' evaluation failed", e)
            }
          }
        }
        val sleepMs = (nextDue.values.min - System.currentTimeMillis())
          .max(50L).min(1000L)
        Thread.sleep(sleepMs)
      } catch { case _: InterruptedException => () }
    }, "graft-rules")
    t.setDaemon(true)
    thread = Some(t)
    t.start()
  }

  def stop(): Unit = if (running.compareAndSet(true, false)) {
    thread.foreach(_.interrupt())
    thread.foreach(_.join(5000))
    thread = None
  }
}
