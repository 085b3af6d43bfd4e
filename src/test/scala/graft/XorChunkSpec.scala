package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RemoteRead, XorChunk}

/** Gorilla XOR chunk codec: bit-exact round-trips across every encoder
  * branch (dod prefix classes, XOR window reuse/renew, specials), plus the
  * chunked-frame protocol (uvarint + CRC32C) and the ChunkedReadResponse
  * marshaling. */
class XorChunkSpec extends AnyFunSuite {

  private def roundtrip(samples: Seq[(Long, Double)]): Unit = {
    val got = XorChunk.decode(XorChunk.encode(samples))
    assert(got.length == samples.length)
    got.zip(samples).zipWithIndex.foreach { case (((gt, gv), (t, v)), i) =>
      assert(gt == t, s"ts mismatch at $i")
      assert(java.lang.Double.doubleToRawLongBits(gv) ==
        java.lang.Double.doubleToRawLongBits(v), s"value bits at $i: $gv vs $v")
    }
  }

  test("empty, single, and two-sample chunks") {
    roundtrip(Nil)
    roundtrip(Seq((1723680000000L, 42.5)))
    roundtrip(Seq((1000L, 1.0), (2000L, -7.25)))
    roundtrip(Seq((-5000L, 0.0), (0L, 0.0))) // negative first ts, xor=0 path
  }

  test("every delta-of-delta prefix class") {
    // dod = 0 (regular scrape), ±small (14-bit), 17-bit, 20-bit, 64-bit
    val t0 = 1723680000000L
    roundtrip(Seq(t0, t0 + 15000, t0 + 30000, t0 + 45000).map((_, 1.0)))
    roundtrip(Seq( // deltas: 15000, 15000+8192(max 14-bit), +65536, +524288
      (t0, 1.0), (t0 + 15000, 2.0), (t0 + 15000 + 23192, 3.0),
      (t0 + 15000 + 23192 + 23192 + 65536, 4.0),
      (t0 + 15000 + 23192 + 23192 + 65536 + 88728 + 524288, 5.0)))
    roundtrip(Seq((0L, 1.0), (10L, 2.0), (20L + (1L << 40), 3.0),
      (30L + (1L << 40), 4.0))) // 64-bit dod both directions
  }

  test("XOR value paths: identical, window reuse, window renew, specials") {
    val t = (0 until 8).map(i => 1000L + i * 1000L)
    roundtrip(t.map((_, 3.14))) // all identical → control bit 0
    // slow drift reuses the leading/trailing window
    roundtrip(t.zipWithIndex.map { case (ts, i) => (ts, 100.0 + i * 0.25) })
    // violent swings force window renewal (and sigbits = 64 via specials)
    roundtrip(Seq((0L, 0.0), (1L, Double.MaxValue), (2L, Double.MinPositiveValue),
      (3L, -0.0), (4L, Double.PositiveInfinity), (5L, Double.NegativeInfinity),
      (6L, Double.NaN), (7L, 1.0)))
  }

  test("pseudo-random walks round-trip at chunk-boundary sizes") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(3, 119, 120, 121, 1000)) {
      var ts = 1723680000000L
      var v = 50.0
      val samples = (0 until n).map { _ =>
        ts += 1 + rnd.nextInt(120000)
        v += (rnd.nextGaussian() * 10)
        if (rnd.nextInt(20) == 0) v = 0.0 // counter-reset-ish
        (ts, v)
      }
      roundtrip(samples)
    }
  }

  test("unsorted timestamps are rejected (TSDB appends in time order)") {
    intercept[IllegalArgumentException](
      XorChunk.encode(Seq((2000L, 1.0), (1000L, 2.0))))
  }

  test("chunked frames: uvarint + CRC32C framing validates and splits; " +
      "corruption is detected") {
    val a = "hello".getBytes("UTF-8")
    val b = Array.fill[Byte](300)(42) // length needs a 2-byte uvarint
    val stream = RemoteRead.frame(a) ++ RemoteRead.frame(b)
    val got = RemoteRead.unframeAll(stream)
    assert(got.length == 2)
    assert(java.util.Arrays.equals(got(0), a))
    assert(java.util.Arrays.equals(got(1), b))
    val corrupted = stream.clone()
    corrupted(stream.length - 1) = (corrupted(stream.length - 1) ^ 1).toByte
    intercept[RuntimeException](RemoteRead.unframeAll(corrupted))
  }

  test("chunked round-trip of the reference's captured Prometheus " +
      "workload: 10k real series through frame + XOR chunk encode/decode " +
      "losslessly") {
    val capture = java.nio.file.Paths.get(
      "/root/reference/src/remote_write/tests/workloads/" +
        "1709380533560664458.data")
    assume(java.nio.file.Files.isRegularFile(capture),
      "reference workload absent")
    val samples = graft.streaming.RemoteWrite.decode(
      java.nio.file.Files.readAllBytes(capture))
    assert(samples.size == 10000)
    // the capture's series → wire Series (labels sorted, samples sorted)
    val series = samples.groupBy(s => (s.name, s.labels)).toSeq
      .sortBy(_._1.toString)
      .map { case ((name, labels), ss) =>
        RemoteRead.Series(("__name__" -> name) +: labels.toSeq.sortBy(_._1),
          ss.map(s => (s.timestamp, s.value)).sortBy(_._1))
      }
    // stream: one ChunkedReadResponse frame per 1000-series batch
    val out = new java.io.ByteArrayOutputStream()
    series.grouped(1000).foreach(batch =>
      out.write(RemoteRead.frame(
        RemoteRead.encodeChunkedFrame(batch, queryIndex = 0L))))
    val decoded = RemoteRead.unframeAll(out.toByteArray)
      .flatMap(f => RemoteRead.decodeChunkedFrame(f)._2)
    assert(decoded.size == series.size)
    decoded.zip(series).foreach { case (got, want) =>
      assert(got.labels == want.labels)
      assert(got.samples.map(_._1) == want.samples.map(_._1))
      got.samples.zip(want.samples).foreach { case ((_, gv), (_, wv)) =>
        assert(java.lang.Double.doubleToRawLongBits(gv) ==
          java.lang.Double.doubleToRawLongBits(wv))
      }
    }
  }

  test("ChunkedReadResponse round-trip: series cut into ≤120-sample XOR " +
      "chunks, labels and query index preserved") {
    val samples = (0 until 250).map(i => (1000L + i * 1000L, i * 1.5))
    val series = RemoteRead.Series(
      Seq("__name__" -> "cpu", "host" -> "a"), samples)
    val body = RemoteRead.encodeChunkedFrame(Seq(series), queryIndex = 3L)
    val (qi, got) = RemoteRead.decodeChunkedFrame(body)
    assert(qi == 3L)
    assert(got.length == 1)
    assert(got.head.labels == series.labels)
    assert(got.head.samples == samples)
  }

  test("streamChunked writes each series' frame before consuming the " +
      "next series' remaining rows — true streaming, never a buffered " +
      "response") {
    import graft.streaming.RemoteRead
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = Seq(("a", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0), ("b", 4L, 4.0))
    val it = rows.iterator.map { r => events += s"row:${r._1}:${r._2}"; r }
    RemoteRead.streamChunked(Seq(it), k => (k, Map.empty),
      _ => events += "write")
    // series a's frame is written after seeing b's FIRST row (the series
    // boundary) and before b's remaining rows are computed
    assert(events.toSeq == Seq("row:a:1", "row:a:2", "row:b:3",
      "write", "row:b:4", "write"), events.toString)
    // payload round-trip: the concatenated frames decode to both series
    // under their query indexes
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    RemoteRead.streamChunked(
      Seq(rows.iterator, Seq(("c", 9L, 9.0)).iterator),
      k => (k, Map("host" -> k)), out += _)
    val frames = RemoteRead.unframeAll(out.toSeq.flatten.toArray)
      .map(RemoteRead.decodeChunkedFrame)
    assert(frames.map(_._1) == Seq(0L, 0L, 1L))
    assert(frames.flatMap(_._2).map(_.samples) ==
      Seq(Seq((1L, 1.0), (2L, 2.0)), Seq((3L, 3.0), (4L, 4.0)),
        Seq((9L, 9.0))))
  }
}
