package graft.streaming

import scala.collection.mutable

/** Hand-rolled codec for the Prometheus remote-READ wire format — the
  * public protobuf layout (prometheus/prompb/remote.proto; the reference
  * ships only the write half at src/pb_types/protos/remote_write.proto, so
  * this extends its serving edge with the protocol Prometheus itself uses
  * to query a remote storage backend via `remote_read:` config):
  *
  * {{{
  * ReadRequest  { repeated Query queries = 1;
  *                repeated ResponseType accepted_response_types = 2; }
  * Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                repeated LabelMatcher matchers = 3; ReadHints hints = 4; }
  * LabelMatcher { Type type = 1; string name = 2; string value = 3; }
  *                // Type: EQ=0 NEQ=1 RE=2 NRE=3
  * ReadResponse { repeated QueryResult results = 1; }  // one per query
  * QueryResult  { repeated TimeSeries timeseries = 1; }
  * TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  * }}}
  *
  * Both negotiated response types are served: `SAMPLES` (0, the snappy-
  * framed default) and `STREAMED_XOR_CHUNKS` (1, round 11) — the chunked
  * streaming variant Prometheus prefers for large reads
  * (prompb ChunkedReadResponse over the uvarint-length + CRC32-Castagnoli
  * frame stream, content type
  * `application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse`;
  * chunk payloads are TSDB Gorilla XOR chunks, [[XorChunk]]):
  *
  * {{{
  * ChunkedReadResponse { repeated ChunkedSeries chunked_series = 1;
  *                       int64 query_index = 2; }
  * ChunkedSeries       { repeated Label labels = 1; repeated Chunk chunks = 2; }
  * Chunk               { int64 min_time_ms = 1; int64 max_time_ms = 2;
  *                       Encoding type = 3;      // XOR = 1
  *                       bytes data = 4; }
  * frame = uvarint(len(data)) ++ crc32c(data, 4 bytes BE) ++ data
  * }}}
  *
  * Chunked frames are NOT snappy-compressed (per the protocol — XOR
  * chunks are already compact). Sampled bodies stay snappy BLOCK
  * compressed on both directions (same framing as remote write;
  * [[RemoteWrite.unframe]] handles the sniffing on the way in). Wire
  * primitives are shared with [[RemoteWrite]] — same
  * varint/length-validation hardening, so crafted length fields error
  * instead of spinning the decode loop.
  */
object RemoteRead {
  import RemoteWrite.{varint, lenAt, skip, lenDelim, writeVarint, fixed64Bytes}

  /** Matcher type ordinals follow prompb: 0=EQ, 1=NEQ, 2=RE, 3=NRE. */
  final case class Matcher(tpe: Int, name: String, value: String)

  /** One remote-read query; timestamps are INCLUSIVE epoch-ms bounds
    * (Prometheus selects `mint <= t <= maxt`). */
  final case class Query(startMs: Long, endMs: Long, matchers: Seq[Matcher])

  /** One result series: labels sorted by name, samples sorted by ts. */
  final case class Series(labels: Seq[(String, String)],
      samples: Seq[(Long, Double)])

  /** prompb matcher → the evaluator's matcher; unknown type ordinals are
    * an error (shared by the HTTP handler and the oracle fixture so the
    * two cannot drift). */
  def toPromQLMatcher(m: Matcher): graft.promql.LabelMatcher =
    graft.promql.LabelMatcher(m.name, m.tpe match {
      case 0 => graft.promql.MatchOp.Eq
      case 1 => graft.promql.MatchOp.Ne
      case 2 => graft.promql.MatchOp.Re
      case 3 => graft.promql.MatchOp.Nre
      case other => throw new IllegalArgumentException(
        s"unknown matcher type $other")
    }, m.value)

  /** Group raw (series_key, ts_ms, value) rows into wire [[Series]]:
    * labels = __name__ + the key's decoded labels, samples time-sorted,
    * series key-sorted — the one response shape both the HTTP handler and
    * the oracle fixture produce. */
  def seriesFromRows(rows: Seq[(String, Long, Double)],
      parseKey: String => (String, Map[String, String])): Seq[Series] =
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (key, rs) =>
      val (name, labels) = parseKey(key)
      Series(("__name__" -> name) +: labels.toSeq.sortBy(_._1),
        rs.map { case (_, ts, v) => (ts, v) }.sortBy(_._1))
    }

  /** A decoded ReadRequest: queries + the client's accepted response
    * types (prompb ordinals: 0 = SAMPLES, 1 = STREAMED_XOR_CHUNKS; empty
    * means SAMPLES). The serving edge negotiates: it answers with the
    * FIRST accepted type it can produce, per the protocol. */
  final case class ReadRequest(queries: Seq[Query], accepted: Seq[Int])

  /** Decode a (snappy-framed or raw) ReadRequest, negotiation left to the
    * caller. */
  def decodeReadRequest(bytes: Array[Byte]): ReadRequest = {
    val b = RemoteWrite.unframe(bytes)
    val queries = mutable.ArrayBuffer.empty[Query]
    val accepted = mutable.ArrayBuffer.empty[Long]
    var pos = 0
    while (pos < b.length) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          queries += decodeQuery(b, p2, p2 + len)
          pos = p2 + len
        case (2, 2) => // packed repeated enum
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) { val (v, qn) = varint(b, q); accepted += v; q = qn }
          pos = p2 + len
        case (2, 0) => // unpacked repeated enum
          val (v, p2) = varint(b, pos); accepted += v; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    ReadRequest(queries.toSeq, accepted.map(_.toInt).toSeq)
  }

  /** Decode a ReadRequest for the SAMPLES path. Fails loudly when the
    * client refuses the SAMPLES response type AND the chunked type —
    * per the protocol the server must answer with a type the client
    * accepts (an empty accepted list means SAMPLES). */
  def decodeRequest(bytes: Array[Byte]): Seq[Query] = {
    val req = decodeReadRequest(bytes)
    require(req.accepted.isEmpty || req.accepted.contains(0),
      s"client accepts only response types ${req.accepted.mkString(",")}; " +
        "this entry point serves SAMPLES (0)")
    req.queries
  }

  private def decodeQuery(b: Array[Byte], start: Int, end: Int): Query = {
    var pos = start
    var startMs = 0L
    var endMs = 0L
    val matchers = mutable.ArrayBuffer.empty[Matcher]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, pos); startMs = v; pos = p2
        case (2, 0) => val (v, p2) = varint(b, pos); endMs = v; pos = p2
        case (3, 2) =>
          val (len, p2) = lenAt(b, pos)
          matchers += decodeMatcher(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt) // hints etc.
      }
    }
    Query(startMs, endMs, matchers.toSeq)
  }

  private def decodeMatcher(b: Array[Byte], start: Int, end: Int): Matcher = {
    var pos = start
    var tpe = 0
    var name = ""
    var value = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, pos); tpe = v.toInt; pos = p2
        case (f, 2) if f == 2 || f == 3 =>
          val (len, p2) = lenAt(b, pos)
          val s = new String(b, p2, len, "UTF-8")
          if (f == 2) name = s else value = s
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    Matcher(tpe, name, value)
  }

  /** Encode a ReadResponse: one QueryResult per query, in request order. */
  def encodeResponse(results: Seq[Seq[Series]]): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    results.foreach { seriesList =>
      val qr = mutable.ArrayBuffer.empty[Byte]
      seriesList.foreach { s =>
        val ts = mutable.ArrayBuffer.empty[Byte]
        s.labels.sortBy(_._1).foreach { case (k, v) =>
          val lbl = lenDelim(1, k.getBytes("UTF-8")) ++
            lenDelim(2, v.getBytes("UTF-8"))
          ts ++= lenDelim(1, lbl.toArray)
        }
        s.samples.sortBy(_._1).foreach { case (t, v) =>
          val sm = mutable.ArrayBuffer.empty[Byte]
          sm += ((1 << 3) | 1).toByte
          sm ++= fixed64Bytes(v)
          sm += ((2 << 3) | 0).toByte
          sm ++= writeVarint(t)
          ts ++= lenDelim(2, sm.toArray)
        }
        qr ++= lenDelim(1, ts.toArray)
      }
      out ++= lenDelim(1, qr.toArray)
    }
    out.toArray
  }

  /** Encode a ReadRequest — the CLIENT side, for tests and soak harnesses
    * (differential twin of [[encodeResponse]], like RemoteWrite.encode). */
  def encodeRequest(queries: Seq[Query],
      acceptedResponseTypes: Seq[Int] = Nil): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    queries.foreach { q =>
      val qb = mutable.ArrayBuffer.empty[Byte]
      qb += ((1 << 3) | 0).toByte
      qb ++= writeVarint(q.startMs)
      qb += ((2 << 3) | 0).toByte
      qb ++= writeVarint(q.endMs)
      q.matchers.foreach { m =>
        val mb = mutable.ArrayBuffer.empty[Byte]
        mb += ((1 << 3) | 0).toByte
        mb ++= writeVarint(m.tpe.toLong)
        mb ++= lenDelim(2, m.name.getBytes("UTF-8"))
        mb ++= lenDelim(3, m.value.getBytes("UTF-8"))
        qb ++= lenDelim(3, mb.toArray)
      }
      out ++= lenDelim(1, qb.toArray)
    }
    if (acceptedResponseTypes.nonEmpty) {
      val packed = mutable.ArrayBuffer.empty[Byte]
      acceptedResponseTypes.foreach(t => packed ++= writeVarint(t.toLong))
      out ++= lenDelim(2, packed.toArray)
    }
    out.toArray
  }

  /** Decode a (snappy-framed or raw) ReadResponse — client side. */
  def decodeResponse(bytes: Array[Byte]): Seq[Seq[Series]] = {
    val b = RemoteWrite.unframe(bytes)
    val results = mutable.ArrayBuffer.empty[Seq[Series]]
    var pos = 0
    while (pos < b.length) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          results += decodeQueryResult(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    results.toSeq
  }

  private def decodeQueryResult(b: Array[Byte], start: Int, end: Int): Seq[Series] = {
    var pos = start
    val series = mutable.ArrayBuffer.empty[Series]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          series += decodeTimeSeries(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    series.toSeq
  }

  private def decodeTimeSeries(b: Array[Byte], start: Int, end: Int): Series = {
    var pos = start
    val labels = mutable.ArrayBuffer.empty[(String, String)]
    val samples = mutable.ArrayBuffer.empty[(Long, Double)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          labels += decodeLabelPair(b, p2, p2 + len)
          pos = p2 + len
        case (2, 2) =>
          val (len, p2) = lenAt(b, pos)
          samples += decodeSamplePair(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    Series(labels.toSeq, samples.toSeq)
  }

  private def decodeLabelPair(b: Array[Byte], start: Int, end: Int): (String, String) = {
    var pos = start
    var name = ""
    var value = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      val (len, p2) = lenAt(b, pos)
      val s = new String(b, p2, len, "UTF-8")
      if ((tag >> 3) == 1) name = s else if ((tag >> 3) == 2) value = s
      pos = p2 + len
    }
    (name, value)
  }

  // ---- STREAMED_XOR_CHUNKS (response type 1) --------------------------

  /** prompb response-type ordinals. */
  val Samples = 0
  val StreamedXorChunks = 1

  /** Content type of the chunked stream (the exact string Prometheus's
    * remote-read client expects). */
  val ChunkedContentType =
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"

  /** TSDB's chunk-size convention: cut a new XOR chunk every 120 samples
    * (≈2 h of 1-minute scrapes — the Gorilla paper's block size). */
  val MaxChunkSamples = 120

  private def crc32c(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32C
    c.update(data, 0, data.length)
    c.getValue.toInt
  }

  /** Wrap one marshaled ChunkedReadResponse into a stream frame:
    * uvarint(len) ++ 4-byte big-endian CRC32-Castagnoli ++ data. */
  def frame(data: Array[Byte]): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    out ++= writeVarint(data.length.toLong)
    val crc = crc32c(data)
    out += ((crc >>> 24) & 0xff).toByte
    out += ((crc >>> 16) & 0xff).toByte
    out += ((crc >>> 8) & 0xff).toByte
    out += (crc & 0xff).toByte
    out ++= data
    out.toArray
  }

  /** Drive a TRUE streaming chunked-read response (round 12): for each
    * query, in order, group its series_key-sorted row iterator into
    * series and hand each series' framed ChunkedReadResponse to `write`
    * AS the series completes — the next series' rows are not consumed
    * past their first row before the previous frame is written, so the
    * transport holds at most ONE series' samples, never the response
    * (Prometheus's own streamed remote-read shape; the round-11 server
    * buffered the full frame set before responding). `rows` must arrive
    * sorted by series_key; sample order within a series is restored by
    * [[seriesFromRows]]. */
  def streamChunked(
      queriesRows: Seq[Iterator[(String, Long, Double)]],
      parseKey: String => (String, Map[String, String]),
      write: Array[Byte] => Unit): Unit = {
    queriesRows.zipWithIndex.foreach { case (it, qi) =>
      val buf = mutable.ArrayBuffer.empty[(String, Long, Double)]
      def flush(): Unit = if (buf.nonEmpty) {
        write(frame(encodeChunkedFrame(
          seriesFromRows(buf.toSeq, parseKey), qi.toLong)))
        buf.clear()
      }
      it.foreach { r =>
        if (buf.nonEmpty && buf.head._1 != r._1) flush()
        buf += r
      }
      flush()
    }
  }

  /** Split a chunked-response byte stream back into frame payloads,
    * validating each CRC (client side / tests). */
  def unframeAll(stream: Array[Byte]): Seq[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = 0
    while (pos < stream.length) {
      val (len, p1) = varint(stream, pos)
      if (len < 0 || p1 + 4 + len > stream.length)
        sys.error(s"chunked frame overruns the stream at $pos")
      val want = ((stream(p1) & 0xff) << 24) | ((stream(p1 + 1) & 0xff) << 16) |
        ((stream(p1 + 2) & 0xff) << 8) | (stream(p1 + 3) & 0xff)
      val data = java.util.Arrays.copyOfRange(stream, p1 + 4, p1 + 4 + len.toInt)
      if (crc32c(data) != want)
        sys.error(s"chunked frame CRC mismatch at $pos")
      out += data
      pos = p1 + 4 + len.toInt
    }
    out.toSeq
  }

  /** Marshal one ChunkedReadResponse: the series' samples cut into XOR
    * chunks of at most `maxChunkSamples`, stamped with their inclusive
    * time bounds. Prometheus streams one frame per series batch; the
    * serving edge calls this once per series. */
  def encodeChunkedFrame(series: Seq[Series], queryIndex: Long,
      maxChunkSamples: Int = MaxChunkSamples): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    series.foreach { s =>
      val cs = mutable.ArrayBuffer.empty[Byte]
      s.labels.sortBy(_._1).foreach { case (k, v) =>
        val lbl = lenDelim(1, k.getBytes("UTF-8")) ++
          lenDelim(2, v.getBytes("UTF-8"))
        cs ++= lenDelim(1, lbl.toArray)
      }
      s.samples.sortBy(_._1).grouped(maxChunkSamples).foreach { slice =>
        val ch = mutable.ArrayBuffer.empty[Byte]
        ch += ((1 << 3) | 0).toByte
        ch ++= writeVarint(slice.head._1) // min_time_ms
        ch += ((2 << 3) | 0).toByte
        ch ++= writeVarint(slice.last._1) // max_time_ms
        ch += ((3 << 3) | 0).toByte
        ch ++= writeVarint(1L) // Encoding.XOR
        ch ++= lenDelim(4, XorChunk.encode(slice))
        cs ++= lenDelim(2, ch.toArray)
      }
      out ++= lenDelim(1, cs.toArray)
    }
    out += ((2 << 3) | 0).toByte
    out ++= writeVarint(queryIndex)
    out.toArray
  }

  /** Decode one ChunkedReadResponse frame payload back to
    * (queryIndex, series with XOR chunks expanded to samples) —
    * client side / tests. */
  def decodeChunkedFrame(bytes: Array[Byte]): (Long, Seq[Series]) = {
    var pos = 0
    var queryIndex = 0L
    val series = mutable.ArrayBuffer.empty[Series]
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(bytes, pos)
          series += decodeChunkedSeries(bytes, p2, p2 + len)
          pos = p2 + len
        case (2, 0) =>
          val (v, p2) = varint(bytes, pos); queryIndex = v; pos = p2
        case (_, wt) => pos = skip(bytes, pos, wt.toInt)
      }
    }
    (queryIndex, series.toSeq)
  }

  private def decodeChunkedSeries(b: Array[Byte], start: Int,
      end: Int): Series = {
    var pos = start
    val labels = mutable.ArrayBuffer.empty[(String, String)]
    val samples = mutable.ArrayBuffer.empty[(Long, Double)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          labels += decodeLabelPair(b, p2, p2 + len)
          pos = p2 + len
        case (2, 2) => // Chunk
          val (len, p2) = lenAt(b, pos)
          var q = p2
          var enc = -1
          var data: Array[Byte] = Array.empty
          while (q < p2 + len) {
            val (ctag, q1) = varint(b, q)
            q = q1
            (ctag >> 3, ctag & 7) match {
              case (3, 0) => val (v, q2) = varint(b, q); enc = v.toInt; q = q2
              case (4, 2) =>
                val (dlen, q2) = lenAt(b, q)
                data = java.util.Arrays.copyOfRange(b, q2, q2 + dlen)
                q = q2 + dlen
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          if (enc != 1) sys.error(s"unsupported chunk encoding $enc")
          samples ++= XorChunk.decode(data)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    Series(labels.toSeq, samples.toSeq)
  }

  private def decodeSamplePair(b: Array[Byte], start: Int, end: Int): (Long, Double) = {
    var pos = start
    var value = 0.0
    var ts = 0L
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 1) =>
          value = java.lang.Double.longBitsToDouble(RemoteWrite.fixed64(b, pos))
          pos += 8
        case (2, 0) => val (t, p2) = varint(b, pos); ts = t; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (ts, value)
  }
}
