package graft.streaming

import scala.collection.mutable

import graft.metric.Sample

/** Hand-rolled decoder for OTLP/HTTP metrics — the OpenTelemetry export
  * protocol (public opentelemetry-proto layout,
  * `ExportMetricsServiceRequest`), the modern ingest path next to the
  * reference's Prometheus remote-write (SURVEY §2.1 S5). Scope: GAUGE and
  * SUM metrics with number data points — the shapes that map directly
  * onto the engine's (name, labels, ts, value) samples; histogram /
  * summary / exponential-histogram records are skipped structurally
  * (unknown-field walk), never an error.
  *
  * Field numbers (opentelemetry-proto, metrics/v1 + common/v1 +
  * resource/v1):
  * {{{
  * ExportMetricsServiceRequest { repeated ResourceMetrics resource_metrics = 1; }
  * ResourceMetrics { Resource resource = 1; repeated ScopeMetrics scope_metrics = 2; }
  * Resource        { repeated KeyValue attributes = 1; }
  * ScopeMetrics    { InstrumentationScope scope = 1; repeated Metric metrics = 2; }
  * Metric          { string name = 1; string description = 2; string unit = 3;
  *                   Gauge gauge = 5; Sum sum = 7; ... }
  * Gauge           { repeated NumberDataPoint data_points = 1; }
  * Sum             { repeated NumberDataPoint data_points = 1;
  *                   AggregationTemporality aggregation_temporality = 2;
  *                   bool is_monotonic = 3; }
  * NumberDataPoint { repeated KeyValue attributes = 7;
  *                   fixed64 start_time_unix_nano = 2;
  *                   fixed64 time_unix_nano = 3;
  *                   double as_double = 4; sfixed64 as_int = 6; }
  * KeyValue        { string key = 1; AnyValue value = 2; }
  * AnyValue        { string string_value = 1; bool bool_value = 2;
  *                   int64 int_value = 3; double double_value = 4; ... }
  * }}}
  *
  * Semantics:
  *  - labels = resource attributes ++ data-point attributes (data point
  *    wins on key collision — the OTLP→Prometheus translation order);
  *    non-string attribute values stringify; attribute NAMES sanitize to
  *    the Prometheus label charset (`service.name` → `service_name`) so
  *    the ingested series stay addressable from PromQL selectors.
  *  - metric names sanitize to the Prometheus charset
  *    (`[a-zA-Z_:][a-zA-Z0-9_:]*`, every other char → '_'), the standard
  *    OTLP→Prometheus name translation; unit suffixing is NOT applied
  *    (documented deviation — unit text rides in metadata, not the name).
  *  - timestamps truncate ns → ms (the engine's resolution).
  *
  * Wire primitives are shared with [[RemoteWrite]] — same varint /
  * length-validation hardening. Bodies may be gzip-compressed
  * (Content-Encoding: gzip is what OTLP/HTTP exporters send) or raw.
  */
object Otlp {
  import RemoteWrite.{varint, lenAt, skip, fixed64}

  /** Decode an ExportMetricsServiceRequest body into engine samples. */
  def decode(bytes: Array[Byte]): Seq[Sample] = {
    val out = mutable.ArrayBuffer.empty[Sample]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(bytes, pos)
          decodeResourceMetrics(bytes, p2, p2 + len, out)
          pos = p2 + len
        case (_, wt) => pos = skip(bytes, pos, wt.toInt)
      }
    }
    out.toSeq
  }

  /** Thrown when a gzip body inflates past the caller's cap — the
    * decompression-bomb guard (a 64 KB crafted gzip expands ~1000:1; an
    * unbounded readAllBytes would OOM the serving JVM straight past the
    * compressed-body cap). */
  final class DecompressedTooLarge(max: Long) extends RuntimeException(
    s"decompressed body exceeds $max bytes")

  /** Gunzip when the body is gzip-framed (OTLP/HTTP's standard
    * Content-Encoding), pass through raw protobuf otherwise. The
    * DECOMPRESSED size is capped at `maxDecompressed` — exceeding it
    * throws [[DecompressedTooLarge]] (a 413 at the HTTP edge). */
  def unframe(bytes: Array[Byte],
      maxDecompressed: Long = 64L << 20): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val out = in.readNBytes(maxDecompressed.toInt + 1)
        if (out.length > maxDecompressed) throw new DecompressedTooLarge(maxDecompressed)
        out
      } catch {
        case e: DecompressedTooLarge => throw e
        case scala.util.control.NonFatal(_) => bytes
      } finally in.close()
    }
    else bytes

  private def decodeResourceMetrics(b: Array[Byte], start: Int, end: Int,
      out: mutable.ArrayBuffer[Sample]): Unit = {
    var pos = start
    var resourceAttrs = Map.empty[String, String]
    val scopeSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // resource
          val (len, p2) = lenAt(b, pos)
          resourceAttrs = decodeAttrList(b, p2, p2 + len, fieldNum = 1)
          pos = p2 + len
        case (2, 2) => // scope_metrics — remember spans, decode after the
          // resource is known (proto field order is not guaranteed)
          val (len, p2) = lenAt(b, pos)
          scopeSpans += ((p2, p2 + len))
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    scopeSpans.foreach { case (s, e) =>
      decodeScopeMetrics(b, s, e, resourceAttrs, out)
    }
  }

  private def decodeScopeMetrics(b: Array[Byte], start: Int, end: Int,
      resourceAttrs: Map[String, String],
      out: mutable.ArrayBuffer[Sample]): Unit = {
    var pos = start
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (2, 2) => // metric
          val (len, p2) = lenAt(b, pos)
          decodeMetric(b, p2, p2 + len, resourceAttrs, out)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
  }

  private def decodeMetric(b: Array[Byte], start: Int, end: Int,
      resourceAttrs: Map[String, String],
      out: mutable.ArrayBuffer[Sample]): Unit = {
    var pos = start
    var name = ""
    val pointSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    var deltaSum = false
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          name = new String(b, p2, len, "UTF-8")
          pos = p2 + len
        case (f, 2) if f == 5 || f == 7 => // gauge | sum
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 2) => // data_points
                val (l2, q2) = lenAt(b, q)
                pointSpans += ((q2, q2 + l2))
                q = q2 + l2
              case (2, 0) if f == 7 => // Sum.aggregation_temporality
                val (v, q2) = varint(b, q)
                // DELTA(1) sums are per-interval increments — ingesting
                // them raw corrupts rate()/increase() (a sawtooth posing
                // as a cumulative counter). Prometheus's OTLP endpoint
                // rejects them by default; so do we: drop the points.
                if (v == 1L) deltaSum = true
                q = q2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt) // histogram etc. skip
      }
    }
    val prom = sanitizeName(name)
    // a nameless metric would ingest an unaddressable "" series
    // (Prometheus rejects these at ingest) — skip like malformed points
    if (prom.nonEmpty && !deltaSum) pointSpans.foreach { case (s, e) =>
      decodeNumberPoint(b, s, e).foreach { case (attrs, tsNano, value) =>
        out += Sample(prom, resourceAttrs ++ attrs, tsNano / 1000000L, value)
      }
    }
  }

  /** NumberDataPoint.flags bit: the point is a staleness marker carrying
    * NO recorded value (opentelemetry-proto DataPointFlags). */
  private val FlagNoRecordedValue = 1L

  /** One NumberDataPoint → (attributes, time ns, value); None when the
    * point carries no timestamp, no value field, or the
    * no-recorded-value staleness flag — each would otherwise ingest a
    * phantom 0.0 (a fake counter reset). Skip the point, not the
    * request. */
  private def decodeNumberPoint(b: Array[Byte], start: Int,
      end: Int): Option[(Map[String, String], Long, Double)] = {
    var pos = start
    var ts = 0L
    var value = 0.0
    var sawValue = false
    var stale = false
    var attrs = Map.empty[String, String]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (3, 1) => ts = fixed64(b, pos); pos += 8
        case (4, 1) =>
          value = java.lang.Double.longBitsToDouble(fixed64(b, pos))
          sawValue = true; pos += 8
        case (6, 1) => // sfixed64
          value = fixed64(b, pos).toDouble; sawValue = true; pos += 8
        case (7, 2) =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len)
          pos = p2 + len
        case (8, 0) => // flags
          val (v, p2) = varint(b, pos)
          stale = (v & FlagNoRecordedValue) != 0L
          pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (ts == 0L || !sawValue || stale) None else Some((attrs, ts, value))
  }

  /** A repeated-KeyValue list where each element is a `fieldNum`-tagged
    * length-delimited KeyValue (Resource.attributes = field 1). */
  private def decodeAttrList(b: Array[Byte], start: Int, end: Int,
      fieldNum: Int): Map[String, String] = {
    var pos = start
    var attrs = Map.empty[String, String]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (f, 2) if f == fieldNum =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    attrs
  }

  private def decodeKeyValue(b: Array[Byte], start: Int,
      end: Int): Map[String, String] = {
    var pos = start
    var key = ""
    var value = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          key = new String(b, p2, len, "UTF-8")
          pos = p2 + len
        case (2, 2) => // AnyValue
          val (len, p2) = lenAt(b, pos)
          value = decodeAnyValue(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (key.isEmpty) Map.empty else Map(sanitizeLabel(key) -> value)
  }

  /** Attribute-name translation (Prometheus label charset — like
    * [[sanitizeName]] but labels may not contain ':'). */
  def sanitizeLabel(name: String): String = {
    val s = name.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    if (s.nonEmpty && s.head.isDigit) "_" + s else s
  }

  private def decodeAnyValue(b: Array[Byte], start: Int, end: Int): String = {
    var pos = start
    var out = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // string_value
          val (len, p2) = lenAt(b, pos)
          out = new String(b, p2, len, "UTF-8")
          pos = p2 + len
        case (2, 0) => // bool_value
          val (v, p2) = varint(b, pos); out = (v != 0L).toString; pos = p2
        case (3, 0) => // int_value
          val (v, p2) = varint(b, pos); out = v.toString; pos = p2
        case (4, 1) => // double_value
          out = java.lang.Double.longBitsToDouble(fixed64(b, pos)).toString
          pos += 8
        case (5, 2) => // array_value: ArrayValue{ repeated AnyValue values = 1 }
          val (len, p2) = lenAt(b, pos)
          val items = mutable.ArrayBuffer.empty[String]
          var q = p2
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 2) =>
                val (l2, q2) = lenAt(b, q)
                items += decodeAnyValue(b, q2, q2 + l2)
                q = q2 + l2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          out = items.mkString("[", ",", "]")
          pos = p2 + len
        case (6, 2) => // kvlist_value: KeyValueList{ repeated KeyValue values = 1 }
          val (len, p2) = lenAt(b, pos)
          val items = mutable.ArrayBuffer.empty[String]
          var q = p2
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 2) =>
                val (l2, q2) = lenAt(b, q)
                decodeKeyValue(b, q2, q2 + l2).foreach { case (k, v) =>
                  items += s"$k=$v" }
                q = q2 + l2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          out = items.mkString("{", ",", "}")
          pos = p2 + len
        case (7, 2) => // bytes_value -> base64 (never a silently-empty label)
          val (len, p2) = lenAt(b, pos)
          out = java.util.Base64.getEncoder.encodeToString(
            java.util.Arrays.copyOfRange(b, p2, p2 + len))
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    out
  }

  /** OTLP→Prometheus metric-name translation: every char outside
    * `[a-zA-Z0-9_:]` becomes '_', a leading digit gains a '_' prefix. */
  def sanitizeName(name: String): String = {
    val s = name.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_' || c == ':') c else '_')
    if (s.nonEmpty && s.head.isDigit) "_" + s else s
  }

  // ------------------------------------------------------------- encoder
  // Test/fixture encoder (differential twin of the decoder, like
  // RemoteWrite.encode): one ResourceMetrics with the given resource
  // attributes and one gauge or sum metric per (name, points) entry.
  import RemoteWrite.{lenDelim, writeVarint, fixed64Bytes}

  final case class Point(attrs: Map[String, String], timeNano: Long,
      value: Double, asInt: Boolean = false, noValue: Boolean = false,
      flags: Long = 0L)

  final case class MetricSpec(name: String, points: Seq[Point],
      sum: Boolean = false, deltaTemporality: Boolean = false)

  def encode(resourceAttrs: Map[String, String],
      metrics: Seq[MetricSpec]): Array[Byte] = {
    def anyString(v: String): Array[Byte] =
      lenDelim(1, v.getBytes("UTF-8")).toArray
    def keyValue(k: String, v: String): Array[Byte] =
      (lenDelim(1, k.getBytes("UTF-8")) ++ lenDelim(2, anyString(v))).toArray
    val resource = resourceAttrs.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => lenDelim(1, keyValue(k, v)) }.toArray
    val metricBufs = metrics.map { m =>
      val pts = m.points.flatMap { p =>
        val dp = mutable.ArrayBuffer.empty[Byte]
        dp += ((3 << 3) | 1).toByte
        dp ++= fixed64LE(p.timeNano)
        if (!p.noValue) {
          if (p.asInt) {
            dp += ((6 << 3) | 1).toByte
            dp ++= fixed64LE(p.value.toLong)
          } else {
            dp += ((4 << 3) | 1).toByte
            dp ++= fixed64Bytes(p.value)
          }
        }
        if (p.flags != 0L) {
          dp += ((8 << 3) | 0).toByte
          dp ++= writeVarint(p.flags)
        }
        p.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          dp ++= lenDelim(7, keyValue(k, v))
        }
        lenDelim(1, dp.toArray)
      }.toArray
      val sumExtra =
        if (m.sum) {
          val t = mutable.ArrayBuffer.empty[Byte]
          t += ((2 << 3) | 0).toByte
          t ++= writeVarint(if (m.deltaTemporality) 1L else 2L)
          t.toArray
        } else Array.emptyByteArray
      val body = lenDelim(1, m.name.getBytes("UTF-8")) ++
        lenDelim(if (m.sum) 7 else 5, pts ++ sumExtra)
      lenDelim(2, body.toArray) // ScopeMetrics.metrics
    }
    val scopeMetrics = metricBufs.flatten.toArray
    val rm = lenDelim(1, resource) ++ lenDelim(2, scopeMetrics)
    lenDelim(1, rm.toArray).toArray // request.resource_metrics
  }

  private def fixed64LE(v: Long): Seq[Byte] =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte)
}
