package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.metric._
import graft.server.HttpFrontend
import graft.storage.{CompactionConfig, CompactionScheduler, Compactor}
import graft.streaming.RemoteWrite

/** Remote-write HTTP soak — closes the loop between `CodecBench`'s parse
  * number and `SinkProbe`'s commit number: the reference's CAPTURED
  * Prometheus workload is replayed against `POST /api/v1/write` over a
  * real socket at the soak cadence (one payload / 500 ms, the reference
  * server's own write tick) for `seconds`, with the 1 s background
  * compaction scheduler running CONCURRENTLY the whole time. Each replay
  * shifts every sample's timestamp past the previous iteration's span, so
  * the stream is genuinely advancing (identical re-posts would merge away
  * on the Overwrite data table and measure nothing).
  *
  * Reports every 30 s (posts, sustained rows/s, live SST count — the
  * file-count equilibrium the scheduler is supposed to hold), then after
  * ingest stops: drains compaction to quiescence and verifies the engine
  * count EXACTLY equals distinct(series, ts) × iterations.
  *
  * Falls back to a synthetic 2,000-sample payload when the reference
  * capture is absent.
  *
  * Run: `sbt "runMain graft.tools.HttpSoak [seconds] [cadenceMs]"`
  */
object HttpSoak {
  def main(args: Array[String]): Unit = {
    val seconds = args.headOption.map(_.toInt).getOrElse(600)
    val cadenceMs = args.lift(1).map(_.toLong).getOrElse(500L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val capture = Paths.get(
      "/root/reference/src/remote_write/tests/workloads/1709380533560664458.data")
    val baseSamples: Seq[Sample] =
      if (Files.isRegularFile(capture)) {
        val s = RemoteWrite.decode(Files.readAllBytes(capture))
        println(s"[httpsoak] captured workload: ${s.size} samples, " +
          s"${s.map(_.name).distinct.size} metrics")
        s
      } else {
        println("[httpsoak] capture absent — synthetic 2000-sample payload")
        (0 until 2000).map(i => Sample("soak_http_metric",
          Map("worker" -> s"w${i % 4}", "host" -> s"h${i % 16}"),
          1723680000000L + i * 250L, i * 0.5))
      }
    // distinct (series, ts) per iteration — the engine's Overwrite key;
    // duplicates inside one payload merge to one row
    val distinctPerIter = baseSamples
      .map(s => (s.name, MetricEngine.labelsKey(s.labels), s.timestamp)).distinct.size
    val tsMin = baseSamples.map(_.timestamp).min
    val span = baseSamples.map(_.timestamp).max - tsMin + 60000L

    val root = Files.createTempDirectory("graft-httpsoak").toString
    val engine = new MetricEngine(spark, root)
    val fe = new HttpFrontend(spark, engine)
    val port = fe.start()
    val compactor = new Compactor(engine.data,
      CompactionConfig(inputSstMinNum = 2, inputSstMaxNum = 30))
    val scheduler = new CompactionScheduler(compactor, intervalMs = 1000L)
    scheduler.start()
    println(s"[httpsoak] port=$port root=$root seconds=$seconds " +
      s"cadence=${cadenceMs}ms scheduler=1s")

    val http = HttpClient.newHttpClient()
    def post(body: Array[Byte]): Int = http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/v1/write"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.discarding()).statusCode()

    val t0 = System.nanoTime()
    val deadline = t0 + seconds * 1000L * 1000L * 1000L
    var iters = 0
    var sstMin = Int.MaxValue
    var sstMax = 0
    var nextReport = t0 + 30L * 1000 * 1000 * 1000
    while (System.nanoTime() < deadline) {
      val tick = System.nanoTime()
      val shift = iters.toLong * span
      val payload = org.xerial.snappy.Snappy.compress(
        RemoteWrite.encode(baseSamples.map(s => s.copy(timestamp = s.timestamp + shift))))
      val code = post(payload)
      require(code == 204, s"write failed with $code at iter $iters")
      iters += 1
      val ssts = engine.data.manifest.allSsts().size
      sstMin = math.min(sstMin, ssts); sstMax = math.max(sstMax, ssts)
      if (System.nanoTime() >= nextReport) {
        val el = (System.nanoTime() - t0) / 1e9
        println(f"[httpsoak] t=$el%.0f s: $iters posts, " +
          f"${iters.toLong * baseSamples.size / el}%.0f rows/s sustained, " +
          s"ssts=$ssts (min=$sstMin max=$sstMax)")
        nextReport += 30L * 1000 * 1000 * 1000
      }
      val sleepMs = cadenceMs - (System.nanoTime() - tick) / 1000000L
      if (sleepMs > 0) Thread.sleep(sleepMs)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val posted = iters.toLong * baseSamples.size

    // quiescence: stop the scheduler's clock only after compaction drains
    var rounds = 0
    while (compactor.runOnce() && rounds < 64) rounds += 1
    scheduler.stop()
    val finalSsts = engine.data.manifest.allSsts().size

    // exactness across every metric the capture carries
    val expected = distinctPerIter.toLong * iters
    val total = baseSamples.map(_.name).distinct.sorted.map { m =>
      engine.query(MetricQuery(m, agg = MetricAgg.Count))
        .collect()(0).getDouble(0).toLong
    }.sum
    println(f"[httpsoak] DONE: $iters posts / $posted rows in $wall%.0f s " +
      f"(${posted / wall}%.0f rows/s sustained, cadence target " +
      f"${baseSamples.size * 1000.0 / cadenceMs}%.0f), " +
      s"sst equilibrium min=$sstMin max=$sstMax final=$finalSsts, " +
      s"count=$total expected=$expected " +
      (if (total == expected) "EXACT" else "MISMATCH"))
    require(total == expected, s"count mismatch: $total vs $expected")
    fe.stop()
    spark.stop()
  }
}
