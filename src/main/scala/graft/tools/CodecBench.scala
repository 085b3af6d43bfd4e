package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import graft.storage.{Manifest, SstFile, TimeRange}
import graft.streaming.RemoteWrite

/** JVM-side mirror of the reference's Criterion micro-bench suite
  * (src/benchmarks/benches/bench.rs) — the only benchmarks the reference
  * defines (BASELINE.md "benchmark definitions"). Same inputs, same
  * shapes, so the numbers are directly comparable to a local run of the
  * reference's suite:
  *
  *  1. Remote-write parse (bench.rs:61-170): decode the captured 1.7 MB
  *     Prometheus workload `1709380533560664458.data`, sequential at the
  *     reference's scales (1/5/10/20/50/100 parses per iteration) and
  *     concurrent (num-cpus threads, like its tokio pool).
  *  2. Manifest snapshot encoding (bench.rs:42-59, encoding_bench.rs):
  *     the do_merge procedure — load a 1000-record snapshot, append 100
  *     records, serialize back. Reference benches pure bytes in memory;
  *     the graft analog runs through the real Manifest (JSON-lines +
  *     local-FS I/O included), so its number is an upper bound.
  *
  * Run: `sbt "runMain graft.tools.CodecBench"`; results in SCALE.md.
  */
object CodecBench {
  def main(args: Array[String]): Unit = {
    val workload = Paths.get(
      "/root/reference/src/remote_write/tests/workloads/1709380533560664458.data")
    require(Files.isReadable(workload), s"workload not found: $workload")
    val bytes = Files.readAllBytes(workload)
    val mb = bytes.length / 1e6

    val nSamples = RemoteWrite.decode(bytes).size
    println(f"[codec] workload: ${bytes.length} bytes, $nSamples samples")

    def bench(label: String, iters: Int)(f: => Unit): Double = {
      (1 to 3).foreach(_ => f) // warmup
      val t0 = System.nanoTime()
      (1 to iters).foreach(_ => f)
      val per = (System.nanoTime() - t0) / 1e6 / iters
      println(f"[codec] $label%-42s $per%9.2f ms/iter")
      per
    }

    // sequential parse at the reference's scales (config.toml sequential_scales)
    for (scale <- Seq(1, 5, 10, 20, 50, 100)) {
      val per = bench(s"remote_write_sequential/graft/$scale",
        iters = math.max(3, 60 / scale)) {
        var i = 0
        while (i < scale) { RemoteWrite.decode(bytes); i += 1 }
      }
      if (scale == 1)
        println(f"[codec]   => ${mb / (per / 1000)}%.0f MB/s, " +
          f"${nSamples / (per / 1000)}%.0f samples/s single-thread")
    }

    // remote-write 2.0: the same captured workload transcoded to the
    // symbol-interned v2 wire (decode → encodeRequestV2), parsed through
    // the SAME auto-sniffed decode() entry point. v2 bodies are smaller
    // (strings interned once) and decode allocates one String per symbol
    // instead of one per label occurrence.
    val reqV1 = RemoteWrite.decodeRequest(bytes)
    val bytesV2 = RemoteWrite.encodeRequestV2(reqV1)
    require(RemoteWrite.decode(bytesV2).size == nSamples,
      "v2 transcode must preserve the sample count")
    val mbV2 = bytesV2.length / 1e6
    println(f"[codec] v2 transcode: ${bytesV2.length} bytes " +
      f"(${100.0 * bytesV2.length / bytes.length}%.0f%% of v1)")
    val perV2 = bench("remote_write_sequential/graft-v2/1", iters = 60) {
      RemoteWrite.decode(bytesV2)
    }
    println(f"[codec]   => ${mbV2 / (perV2 / 1000)}%.0f MB/s wire, " +
      f"${nSamples / (perV2 / 1000)}%.0f samples/s single-thread")

    // concurrent parse: num-cpus tasks each doing `scale` parses
    val cpus = Runtime.getRuntime.availableProcessors()
    val pool = Executors.newFixedThreadPool(cpus)
    for (scale <- Seq(10, 50)) {
      val per = bench(s"remote_write_concurrent/graft/${cpus}x$scale", iters = 3) {
        val futs = (1 to cpus).map(_ => pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < scale) { RemoteWrite.decode(bytes); i += 1 }
          }
        }))
        futs.foreach(_.get())
      }
      println(f"[codec]   => ${cpus * scale * mb / (per / 1000)}%.0f MB/s aggregate")
    }
    pool.shutdown()

    // manifest snapshot encoding: 1000-record snapshot + 100 appends →
    // merge (encoding_bench.rs raw_bytes_bench, through the real store)
    val root = Files.createTempDirectory("graft-codec-manifest").toString
    val seed = new Manifest(root, mergeThreshold = Int.MaxValue)
    seed.update((1 to 1000).map(i =>
      SstFile(i.toLong, s"/data/$i.parquet", 1, 1, TimeRange(1, 2))))
    seed.mergeSnapshot()
    var nextId = 10000L
    bench("manifest_encoding/snapshot_1000+100", iters = 20) {
      val m = new Manifest(root, mergeThreshold = Int.MaxValue) // load 1000
      m.update((1 to 100).map { _ =>
        nextId += 1
        SstFile(nextId, s"/data/$nextId.parquet", 1, 1, TimeRange(1, 2))
      })
      m.mergeSnapshot() // serialize 1000+appends back
    }
    println("[codec] OK")
  }
}
