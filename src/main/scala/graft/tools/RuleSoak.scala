package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.metric.{MetricEngine, Sample}
import graft.server.{AlertingRule, HttpFrontend, RecordingRule, RuleGroup}
import graft.streaming.RemoteWrite

/** Rule-evaluation soak: live remote-write ingest through the HTTP
  * frontend at a fixed cadence while the REAL rule scheduler evaluates a
  * recording rule and an alerting rule every 2 s against the moving head
  * of the store — the serving mix of a Prometheus deployment with rules
  * on. Samples are stamped with wall-clock time at post, so the instant
  * lookback window tracks the live head exactly as in production.
  *
  * The writer ramps sample values, so the alert crosses its threshold
  * mid-soak and must walk pending → firing through the scheduler's own
  * evaluations (no synthetic clock). Rule writes contend with HTTP
  * ingest on the frontend's single-writer lock — that contention is part
  * of what's measured.
  *
  * Reported and asserted at the end:
  *  - rule evaluation count and FAILURES (must be 0),
  *  - recorded-series continuity: one `worker:soak:sum` sample per
  *    evaluation per worker label, and the median/max spacing between
  *    consecutive recorded evaluation timestamps vs the 2 s interval,
  *  - the alert reached `firing` and its ALERTS series landed in storage,
  *  - sustained ingest rows/s alongside (the rules must not stall writes).
  *
  * Usage: `runMain graft.tools.RuleSoak [seconds] [cadenceMs]`
  * (defaults 90 s, 500 ms). */
object RuleSoak {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(90)
    val cadenceMs = args.lift(1).map(_.toLong).getOrElse(500L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val workers = 4
    val hosts = 16
    // threshold crossed once the per-iteration value ramp passes it:
    // sum by (worker) = hosts * value(iter) > 300 <=> iter > 18
    val threshold = 300.0

    val root = Files.createTempDirectory("graft-rulesoak").toString
    val engine = new MetricEngine(spark, root)
    val rules = Seq(RuleGroup("soak", intervalMs = 2000L, rules = Seq(
      RecordingRule("worker:soak:sum", "sum by (worker) (soak_metric)"),
      AlertingRule("SoakHigh", s"sum by (worker) (soak_metric) > $threshold",
        forMs = 10000L))))
    val fe = new HttpFrontend(spark, engine, rules = rules)
    val port = fe.start()
    val re = fe.ruleEngine.get
    println(s"[rulesoak] port=$port root=$root seconds=$seconds " +
      s"cadence=${cadenceMs}ms rules=2s for=10s threshold=$threshold")

    val http = HttpClient.newHttpClient()
    def post(body: Array[Byte]): Int = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/v1/write"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode()

    try {
      val t0 = System.nanoTime()
      val soakStartMs = System.currentTimeMillis()
      val deadline = t0 + seconds * 1000L * 1000L * 1000L
      var iters = 0
      var rows = 0L
      var nextReport = t0 + 15L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline) {
        val tick = System.nanoTime()
        val now = System.currentTimeMillis()
        val value = (iters + 1).toDouble // the ramp
        val samples = for (w <- 0 until workers; h <- 0 until hosts)
          yield Sample("soak_metric",
            Map("worker" -> s"w$w", "host" -> s"h$h"), now, value)
        val code = post(org.xerial.snappy.Snappy.compress(
          RemoteWrite.encode(samples)))
        require(code == 204, s"write failed with $code at iter $iters")
        iters += 1
        rows += samples.size
        if (System.nanoTime() >= nextReport) {
          val el = (System.nanoTime() - t0) / 1e9
          println(f"[rulesoak] t=$el%.0f s: $iters posts, " +
            f"${rows / el}%.0f rows/s, rule evals=${re.evaluationsTotal} " +
            s"(failures=${re.evaluationFailuresTotal}), " +
            s"alert=${re.ruleState("soak", 1)}")
          nextReport += 15L * 1000 * 1000 * 1000
        }
        val sleepMs = cadenceMs - (System.nanoTime() - tick) / 1000000L
        if (sleepMs > 0) Thread.sleep(sleepMs)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val soakEndMs = System.currentTimeMillis()
      fe.stop() // stops the scheduler; no more rule writes

      val evals = re.evaluationsTotal
      val fails = re.evaluationFailuresTotal
      println(f"[rulesoak] done: $iters posts / $rows rows in $wall%.1f s " +
        f"= ${rows / wall}%.0f rows/s; $evals rule evaluations, $fails failures")
      require(fails == 0, s"$fails rule evaluations failed")
      require(evals >= 2, "scheduler never evaluated")

      // recorded-series continuity: every evaluation of the recording rule
      // wrote one sample per worker; spacing between consecutive recorded
      // eval timestamps tracks the 2 s interval when evaluations keep up
      val rec = engine.queryPromQL("sum by (worker) (worker:soak:sum)",
        graft.storage.TimeRange(soakStartMs, soakEndMs + 1),
        stepMs = Some(1L)) // 1 ms buckets = raw eval stamps
      val recRows = rec.collect()
      val perWorker = recRows.groupBy(_.getAs[String]("worker"))
        .view.mapValues(_.length).toMap
      println(s"[rulesoak] recorded samples per worker: $perWorker " +
        s"(recording evals=${evals / 2})")
      require(perWorker.size == workers,
        s"expected $workers recorded worker series, got ${perWorker.size}")
      val evalTimes = recRows.map(_.getAs[Long]("bucket_ms")).distinct.sorted
      val gaps = evalTimes.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      if (gaps.nonEmpty) {
        val sortedGaps = gaps.sorted
        val med = sortedGaps(sortedGaps.size / 2)
        println(s"[rulesoak] recorded eval spacing ms: median=$med " +
          s"max=${sortedGaps.last} n=${evalTimes.size}")
      }

      // the ramp crossed the threshold and held: the alert must have fired
      // through the scheduler's own pending->firing walk, and its ALERTS
      // series must be in storage
      require(re.ruleState("soak", 1) == "firing",
        s"alert state ${re.ruleState("soak", 1)} != firing")
      val firing = engine.queryPromQL(
        """sum by (worker) (ALERTS{alertname="SoakHigh",alertstate="firing"})""",
        graft.storage.TimeRange(soakStartMs, soakEndMs + 1)).collect()
      require(firing.length == workers,
        s"expected $workers firing worker alerts in storage, got ${firing.length}")
      println(s"[rulesoak] PASS: ${firing.length} firing alert series " +
        "persisted; recorded series continuous; 0 evaluation failures")
    } catch {
      case e: Throwable =>
        try fe.stop() catch { case _: Throwable => () }
        throw e
    } finally {
      spark.stop()
    }
  }
}
