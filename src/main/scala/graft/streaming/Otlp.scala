package graft.streaming

import scala.collection.mutable

import graft.metric.Sample

/** Hand-rolled decoder for OTLP/HTTP metrics — the OpenTelemetry export
  * protocol (public opentelemetry-proto layout,
  * `ExportMetricsServiceRequest`), the modern ingest path next to the
  * reference's Prometheus remote-write (SURVEY §2.1 S5). Scope: GAUGE and
  * SUM metrics with number data points (→ engine samples), EXPONENTIAL
  * HISTOGRAM data points (→ native histogram samples: OTLP `scale` IS the
  * Prometheus schema, bucket indexes shift by one — see
  * [[decodeExponentialPoint]]), and fixed-bucket HISTOGRAM data points
  * (→ NHCB custom-bound native histograms, the standard
  * classic-histogram-on-the-native-wire translation), and SUMMARY data
  * points (→ the classic `<name>_sum` / `<name>_count` /
  * `<name>{quantile="q"}` series triple, the standard OTLP→Prometheus
  * summary mapping). Every OTLP metric kind now ingests — nothing is
  * accepted-and-dropped.
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
  *    OTLP→Prometheus name translation; MONOTONIC cumulative sums gain
  *    the `_total` counter suffix (no double suffix), Prometheus's
  *    default "with suffixes" strategy. UNIT suffixing is NOT applied
  *    (documented deviation — unit text rides in metadata, not the name;
  *    a full UCUM unit map is out of scope).
  *  - `utf8Names = true` switches to Prometheus 3's
  *    `NoUTF8EscapingWithSuffixes` translation: metric AND label names
  *    pass through verbatim (the engine stores and serves them — the
  *    quoted PromQL selector syntax addresses them) while the `_total`
  *    suffix rule stays. Keys inside a kvlist attribute VALUE still
  *    sanitize — they stringify into a label value, not a label name.
  *  - timestamps truncate ns → ms (the engine's resolution).
  *
  * Wire primitives are shared with [[RemoteWrite]] — same varint /
  * length-validation hardening. Bodies may be gzip-compressed
  * (Content-Encoding: gzip is what OTLP/HTTP exporters send) or raw.
  */
object Otlp {
  import RemoteWrite.{varint, lenAt, skip, fixed64}

  /** Everything one OTLP request decodes to: number-point samples,
    * native-histogram samples (exponential histograms directly,
    * fixed-bucket histograms as NHCB), and exemplars (from number,
    * histogram, and exponential-histogram data points — trace/span ids
    * become `trace_id`/`span_id` labels, the Prometheus translation). */
  final case class Decoded(samples: Seq[Sample],
      histograms: Seq[RemoteWrite.HistogramSample],
      exemplars: Seq[RemoteWrite.Exemplar] = Nil)

  /** Decode an ExportMetricsServiceRequest body into engine samples
    * (number points only — see [[decodeAll]] for histograms too). */
  def decode(bytes: Array[Byte], utf8Names: Boolean = false): Seq[Sample] =
    decodeAll(bytes, utf8Names).samples

  /** Decode an ExportMetricsServiceRequest body into samples AND native
    * histograms. */
  def decodeAll(bytes: Array[Byte], utf8Names: Boolean = false): Decoded = {
    val out = mutable.ArrayBuffer.empty[Sample]
    val outH = mutable.ArrayBuffer.empty[RemoteWrite.HistogramSample]
    val outE = mutable.ArrayBuffer.empty[RemoteWrite.Exemplar]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(bytes, pos)
          decodeResourceMetrics(bytes, p2, p2 + len, out, outH, outE,
            utf8Names)
          pos = p2 + len
        case (_, wt) => pos = skip(bytes, pos, wt.toInt)
      }
    }
    Decoded(out.toSeq, outH.toSeq, outE.toSeq)
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
      out: mutable.ArrayBuffer[Sample],
      outH: mutable.ArrayBuffer[RemoteWrite.HistogramSample],
      outE: mutable.ArrayBuffer[RemoteWrite.Exemplar],
      utf8: Boolean): Unit = {
    var pos = start
    var resourceAttrs = Map.empty[String, String]
    val scopeSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // resource
          val (len, p2) = lenAt(b, pos)
          resourceAttrs = decodeAttrList(b, p2, p2 + len, fieldNum = 1,
            utf8)
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
      decodeScopeMetrics(b, s, e, resourceAttrs, out, outH, outE, utf8)
    }
  }

  private def decodeScopeMetrics(b: Array[Byte], start: Int, end: Int,
      resourceAttrs: Map[String, String],
      out: mutable.ArrayBuffer[Sample],
      outH: mutable.ArrayBuffer[RemoteWrite.HistogramSample],
      outE: mutable.ArrayBuffer[RemoteWrite.Exemplar],
      utf8: Boolean): Unit = {
    var pos = start
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (2, 2) => // metric
          val (len, p2) = lenAt(b, pos)
          decodeMetric(b, p2, p2 + len, resourceAttrs, out, outH, outE,
            utf8)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
  }

  private def decodeMetric(b: Array[Byte], start: Int, end: Int,
      resourceAttrs: Map[String, String],
      out: mutable.ArrayBuffer[Sample],
      outH: mutable.ArrayBuffer[RemoteWrite.HistogramSample],
      outE: mutable.ArrayBuffer[RemoteWrite.Exemplar],
      utf8: Boolean): Unit = {
    var pos = start
    var name = ""
    val pointSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    val histSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    val expSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    val summarySpans = mutable.ArrayBuffer.empty[(Int, Int)]
    var deltaSum = false
    var monotonic = false
    var deltaHist = false
    var deltaExp = false
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
              case (3, 0) if f == 7 => // Sum.is_monotonic
                val (v, q2) = varint(b, q)
                monotonic = v != 0L
                q = q2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          pos = p2 + len
        case (f, 2) if f == 9 || f == 10 => // histogram | exponential_histogram
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 2) => // data_points
                val (l2, q2) = lenAt(b, q)
                if (f == 9) histSpans += ((q2, q2 + l2))
                else expSpans += ((q2, q2 + l2))
                q = q2 + l2
              case (2, 0) => // aggregation_temporality — DELTA drops, like sums
                val (v, q2) = varint(b, q)
                if (v == 1L) { if (f == 9) deltaHist = true else deltaExp = true }
                q = q2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          pos = p2 + len
        case (11, 2) => // summary — Summary{ data_points = 1 }
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 2) =>
                val (l2, q2) = lenAt(b, q)
                summarySpans += ((q2, q2 + l2))
                q = q2 + l2
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    // monotonic cumulative sums gain the Prometheus counter suffix —
    // the default OTLP→Prometheus translation (strategy "with suffixes");
    // a name already ending in _total is left alone (no double suffix)
    val prom0 = if (utf8) name else sanitizeName(name)
    val prom =
      if (monotonic && !deltaSum && prom0.nonEmpty &&
          !prom0.endsWith("_total")) prom0 + "_total"
      else prom0
    // a nameless metric would ingest an unaddressable "" series
    // (Prometheus rejects these at ingest) — skip like malformed points
    // Per-span attrs of the points that actually INGESTED — captured from
    // the first decode pass so (a) exemplars on skipped points
    // (stale/timeless/valueless) drop with their point exactly like the
    // delta-dropped case below, and (b) the exemplar pass never re-decodes
    // attributes it already has (the old second walk re-parsed every
    // point's attribute maps even when it carried zero exemplars).
    val ingested = mutable.Map.empty[(Int, Int), Map[String, String]]
    if (prom.nonEmpty && !deltaSum) pointSpans.foreach { case (s, e) =>
      decodeNumberPoint(b, s, e, utf8).foreach { case (attrs, tsNano, value) =>
        out += Sample(prom, resourceAttrs ++ attrs, tsNano / 1000000L, value)
        ingested((s, e)) = attrs
      }
    }
    if (prom.nonEmpty && !deltaHist) histSpans.foreach { case (s, e) =>
      decodeFixedHistogramPoint(b, s, e, utf8).foreach { h =>
        outH += h.copy(name = prom, labels = resourceAttrs ++ h.labels)
        ingested((s, e)) = h.labels
      }
    }
    if (prom.nonEmpty && !deltaExp) expSpans.foreach { case (s, e) =>
      decodeExponentialPoint(b, s, e, utf8).foreach { h =>
        outH += h.copy(name = prom, labels = resourceAttrs ++ h.labels)
        ingested((s, e)) = h.labels
      }
    }
    // Exemplars ride on number, histogram, and exponential-histogram
    // data points; they ingest with their point's series labels
    // (resource ++ point attributes), trace/span ids as
    // `trace_id`/`span_id` exemplar labels — the Prometheus OTLP
    // translation. Dropped points (delta metrics, stale/timeless points)
    // drop their exemplars with them — the series they'd attach to was
    // never ingested.
    def emitExemplars(spans: Seq[(Int, Int)], exF: Int): Unit =
      spans.foreach { case (s0, e0) =>
        ingested.get((s0, e0)).foreach { attrs =>
          exemplarSpans(b, s0, e0, exF).foreach { case (xs, xe) =>
            decodeOtlpExemplar(b, xs, xe, utf8).foreach { case (labels, tsNano, v) =>
              outE += RemoteWrite.Exemplar(prom, resourceAttrs ++ attrs,
                labels, v, tsNano / 1000000L)
            }
          }
        }
      }
    if (prom.nonEmpty) {
      if (!deltaSum) emitExemplars(pointSpans.toSeq, exF = 5)
      if (!deltaHist) emitExemplars(histSpans.toSeq, exF = 8)
      if (!deltaExp) emitExemplars(expSpans.toSeq, exF = 11)
    }
    // Summaries translate to the classic Prometheus series triple —
    // `<name>_sum`, `<name>_count`, and one `<name>{quantile="q"}` series
    // per reported quantile (the standard OTLP→Prometheus mapping; the
    // quantile label renders like Go strconv 'f', e.g. "0.99").
    if (prom.nonEmpty) summarySpans.foreach { case (s, e) =>
      decodeSummaryPoint(b, s, e, utf8).foreach {
        case (attrs, tsNano, count, sum, quantiles) =>
          val tsMs = tsNano / 1000000L
          val base = resourceAttrs ++ attrs
          out += Sample(prom + "_sum", base, tsMs, sum)
          out += Sample(prom + "_count", base, tsMs, count.toDouble)
          quantiles.foreach { case (q, v) =>
            out += Sample(prom,
              base + ("quantile" -> goFloatText(q)), tsMs, v)
          }
      }
    }
  }

  /** Scala mirror of the engine's Go-float rendering for the summary
    * `quantile` label (`strconv.FormatFloat(q, 'f', -1, 64)`): quantiles
    * are small decimals, so Java's shortest repr only needs the
    * integral-".0" strip and sub-1e-3 exponent expansion. */
  private def goFloatText(v: Double): String = {
    val s = v.toString
    if (!s.contains("E")) s.stripSuffix(".0")
    else { // e.g. 5.0E-4 → 0.0005
      val Array(m, e) = s.split("E")
      val digits0 = m.replace("-", "").replace(".", "").reverse
        .dropWhile(_ == '0').reverse
      val digits = if (digits0.isEmpty) "0" else digits0
      val exp = e.toInt
      val sign = if (s.startsWith("-")) "-" else ""
      if (exp < 0) sign + "0." + ("0" * (-exp - 1)) + digits
      else if (digits.length <= exp + 1)
        sign + digits.padTo(exp + 1, '0')
      else sign + digits.substring(0, exp + 1) + "." +
        digits.substring(exp + 1)
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
      end: Int, utf8: Boolean): Option[(Map[String, String], Long, Double)] = {
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
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
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

  /** One OTLP ExponentialHistogramDataPoint → a Prometheus native
    * histogram sample (name/resource labels filled by the caller).
    *
    * Index translation: OTLP bucket `i` at `offset` covers
    * `(base^(offset+i), base^(offset+i+1)]` with `base = 2^(2^-scale)`;
    * the Prometheus native bucket covering that interval is index
    * `offset+i+1` (Prometheus bucket `k` covers `(base^(k-1), base^k]`).
    * OTLP `scale` IS the Prometheus schema. Scales above 8 downscale to 8
    * by merging adjacent bucket pairs (`idx → ((idx-1) >> d) + 1` per
    * halving — exact, the same arithmetic Prometheus's own OTLP endpoint
    * and `reduceResolution` use); scales below -4 have no Prometheus
    * representation and the point is skipped, as are points with no
    * timestamp or the no-recorded-value staleness flag.
    *
    * Field numbers (opentelemetry-proto metrics/v1
    * ExponentialHistogramDataPoint): attributes=1, time_unix_nano=3,
    * count=4 (fixed64), sum=5 (double), scale=6 (sint32), zero_count=7
    * (fixed64), positive=8, negative=9 (Buckets{offset=1 sint32,
    * bucket_counts=2 repeated uint64}), flags=10, zero_threshold=14. */
  private def decodeExponentialPoint(b: Array[Byte], start: Int,
      end: Int, utf8: Boolean): Option[RemoteWrite.HistogramSample] = {
    var pos = start
    var ts = 0L; var count = 0L; var sum = 0.0; var scale = 0
    var zeroCount = 0L; var zeroTh = 0.0; var stale = false
    var attrs = Map.empty[String, String]
    var posB: (Int, Seq[Long]) = (0, Nil)
    var negB: (Int, Seq[Long]) = (0, Nil)
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
          pos = p2 + len
        case (3, 1) => ts = fixed64(b, pos); pos += 8
        case (4, 1) => count = fixed64(b, pos); pos += 8
        case (5, 1) =>
          sum = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (6, 0) =>
          val (v, p2) = varint(b, pos)
          scale = RemoteWrite.zigzagDecode(v).toInt; pos = p2
        case (7, 1) => zeroCount = fixed64(b, pos); pos += 8
        case (8, 2) =>
          val (len, p2) = lenAt(b, pos)
          posB = decodeExpBuckets(b, p2, p2 + len); pos = p2 + len
        case (9, 2) =>
          val (len, p2) = lenAt(b, pos)
          negB = decodeExpBuckets(b, p2, p2 + len); pos = p2 + len
        case (10, 0) =>
          val (v, p2) = varint(b, pos)
          stale = (v & FlagNoRecordedValue) != 0L; pos = p2
        case (14, 1) =>
          zeroTh = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (ts == 0L || stale || scale < -4) None
    else {
      val down = math.max(0, scale - 8)
      Some(RemoteWrite.HistogramSample("", attrs, ts / 1000000L,
        count = count.toDouble, sum = sum, schema = math.min(scale, 8),
        zeroThreshold = zeroTh, zeroCount = zeroCount.toDouble,
        positiveBuckets = toPromBuckets(posB._1, posB._2, down),
        negativeBuckets = toPromBuckets(negB._1, negB._2, down)))
    }
  }

  /** ExponentialHistogramDataPoint.Buckets: offset (sint32) + repeated
    * uint64 bucket_counts (packed or unpacked). */
  private def decodeExpBuckets(b: Array[Byte], start: Int,
      end: Int): (Int, Seq[Long]) = {
    var pos = start
    var offset = 0
    val counts = mutable.ArrayBuffer.empty[Long]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) =>
          val (v, p2) = varint(b, pos)
          offset = RemoteWrite.zigzagDecode(v).toInt; pos = p2
        case (2, 2) => // packed
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) {
            val (v, q2) = varint(b, q); counts += v; q = q2
          }
          pos = p2 + len
        case (2, 0) =>
          val (v, p2) = varint(b, pos); counts += v; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (offset, counts.toSeq)
  }

  /** OTLP dense buckets → sparse Prometheus (index, count) pairs: shift
    * by one ([[decodeExponentialPoint]]'s index translation), drop empty
    * buckets, then merge adjacent pairs `down` times for scales above the
    * Prometheus maximum. */
  private def toPromBuckets(offset: Int, counts: Seq[Long],
      down: Int): Seq[(Int, Double)] = {
    val merged = scala.collection.mutable.TreeMap.empty[Int, Double]
    counts.zipWithIndex.foreach { case (c, i) =>
      if (c != 0L) {
        val idx0 = offset + i + 1
        val idx = if (down > 0) ((idx0 - 1) >> down) + 1 else idx0
        merged(idx) = merged.getOrElse(idx, 0.0) + c.toDouble
      }
    }
    merged.toSeq
  }

  /** One data point's exemplar sub-spans, for any point kind (`exF` =
    * that kind's exemplars field number: number 5, fixed-bucket
    * histogram 8, exponential histogram 11). A second cheap walk over
    * the point bytes — spans only, zero allocation for points without
    * exemplars (attributes come from the point's first decode pass). */
  private def exemplarSpans(b: Array[Byte], start: Int, end: Int,
      exF: Int): Seq[(Int, Int)] = {
    var pos = start
    val ex = mutable.ArrayBuffer.empty[(Int, Int)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (f, 2) if f == exF =>
          val (len, p2) = lenAt(b, pos)
          ex += ((p2, p2 + len)); pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    ex.toSeq
  }

  /** One OTLP Exemplar → (exemplar labels, time ns, value). Field
    * numbers (metrics/v1 Exemplar): filtered_attributes=7,
    * time_unix_nano=2, as_double=3, span_id=4 (bytes → lowercase hex),
    * trace_id=5 (bytes → lowercase hex), as_int=6. Timeless or valueless
    * exemplars skip. */
  private def decodeOtlpExemplar(b: Array[Byte], start: Int,
      end: Int, utf8: Boolean): Option[(Map[String, String], Long, Double)] = {
    var pos = start
    var ts = 0L; var v = 0.0; var saw = false
    var attrs = Map.empty[String, String]
    var traceId = ""; var spanId = ""
    def hex(from: Int, len: Int): String =
      (from until from + len).map(i => f"${b(i) & 0xff}%02x").mkString
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (7, 2) =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
          pos = p2 + len
        case (2, 1) => ts = fixed64(b, pos); pos += 8
        case (3, 1) =>
          v = java.lang.Double.longBitsToDouble(fixed64(b, pos))
          saw = true; pos += 8
        case (6, 1) => v = fixed64(b, pos).toDouble; saw = true; pos += 8
        case (4, 2) =>
          val (len, p2) = lenAt(b, pos)
          spanId = hex(p2, len); pos = p2 + len
        case (5, 2) =>
          val (len, p2) = lenAt(b, pos)
          traceId = hex(p2, len); pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (ts == 0L || !saw) None
    else Some((attrs ++
      (if (traceId.nonEmpty) Map("trace_id" -> traceId) else Map.empty) ++
      (if (spanId.nonEmpty) Map("span_id" -> spanId) else Map.empty),
      ts, v))
  }

  /** One OTLP SummaryDataPoint → (attributes, time ns, count, sum,
    * (quantile, value) pairs). Field numbers (SummaryDataPoint):
    * time_unix_nano=3, count=4 (fixed64), sum=5 (double),
    * quantile_values=6 (ValueAtQuantile{ quantile=1, value=2 — both
    * double }), attributes=7, flags=8. Points with no timestamp or the
    * no-recorded-value staleness flag skip, like number points. */
  private def decodeSummaryPoint(b: Array[Byte], start: Int, end: Int,
      utf8: Boolean)
      : Option[(Map[String, String], Long, Long, Double,
        Seq[(Double, Double)])] = {
    var pos = start
    var ts = 0L; var count = 0L; var sum = 0.0; var stale = false
    var attrs = Map.empty[String, String]
    val quantiles = mutable.ArrayBuffer.empty[(Double, Double)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (3, 1) => ts = fixed64(b, pos); pos += 8
        case (4, 1) => count = fixed64(b, pos); pos += 8
        case (5, 1) =>
          sum = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (6, 2) =>
          val (len, p2) = lenAt(b, pos)
          var q = p2
          var qq = 0.0; var qv = 0.0
          while (q < p2 + len) {
            val (t2, q1) = varint(b, q)
            q = q1
            (t2 >> 3, t2 & 7) match {
              case (1, 1) =>
                qq = java.lang.Double.longBitsToDouble(fixed64(b, q)); q += 8
              case (2, 1) =>
                qv = java.lang.Double.longBitsToDouble(fixed64(b, q)); q += 8
              case (_, wt) => q = skip(b, q, wt.toInt)
            }
          }
          quantiles += ((qq, qv))
          pos = p2 + len
        case (7, 2) =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
          pos = p2 + len
        case (8, 0) =>
          val (v, p2) = varint(b, pos)
          stale = (v & FlagNoRecordedValue) != 0L; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (ts == 0L || stale) None
    else Some((attrs, ts, count, sum, quantiles.toSeq))
  }

  /** One OTLP fixed-bucket HistogramDataPoint → an NHCB native histogram
    * (schema -53): `explicit_bounds` become `custom_values`, bucket i
    * keeps index i (engine NHCB convention: bucket i covers
    * `(custom_values[i-1], custom_values[i]]`, bucket 0 starts at 0), and
    * the final `(last_bound, +Inf)` count lands at index
    * `size(custom_values)` — the overflow bucket
    * [[graft.metric.NativeHistograms]] clamps to the highest finite
    * bound, Prometheus's classic-histogram quantile convention. Points
    * with no timestamp, the staleness flag, empty bounds, or a
    * counts/bounds length mismatch are skipped (malformed under the OTLP
    * spec, which requires `len(counts) == len(bounds) + 1`).
    *
    * Field numbers (HistogramDataPoint): attributes=9, time_unix_nano=3,
    * count=4 (fixed64), sum=5 (double), bucket_counts=6 (repeated
    * fixed64, packed), explicit_bounds=7 (repeated double, packed),
    * flags=10. */
  private def decodeFixedHistogramPoint(b: Array[Byte], start: Int,
      end: Int, utf8: Boolean): Option[RemoteWrite.HistogramSample] = {
    var pos = start
    var ts = 0L; var count = 0L; var sum = 0.0; var stale = false
    var attrs = Map.empty[String, String]
    val counts = mutable.ArrayBuffer.empty[Long]
    val bounds = mutable.ArrayBuffer.empty[Double]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (9, 2) =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
          pos = p2 + len
        case (3, 1) => ts = fixed64(b, pos); pos += 8
        case (4, 1) => count = fixed64(b, pos); pos += 8
        case (5, 1) =>
          sum = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (6, 2) => // packed fixed64 bucket_counts
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q + 8 <= p2 + len) { counts += fixed64(b, q); q += 8 }
          pos = p2 + len
        case (6, 1) => counts += fixed64(b, pos); pos += 8
        case (7, 2) => // packed double explicit_bounds
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q + 8 <= p2 + len) {
            bounds += java.lang.Double.longBitsToDouble(fixed64(b, q)); q += 8
          }
          pos = p2 + len
        case (7, 1) =>
          bounds += java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (10, 0) =>
          val (v, p2) = varint(b, pos)
          stale = (v & FlagNoRecordedValue) != 0L; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    if (ts == 0L || stale || bounds.isEmpty || counts.length != bounds.length + 1)
      None
    else Some(RemoteWrite.HistogramSample("", attrs, ts / 1000000L,
      count = count.toDouble, sum = sum, schema = -53,
      zeroThreshold = 0.0, zeroCount = 0.0,
      positiveBuckets = counts.zipWithIndex.collect {
        case (c, i) if c != 0L => (i, c.toDouble) }.toSeq,
      negativeBuckets = Nil,
      customValues = bounds.toSeq))
  }

  /** A repeated-KeyValue list where each element is a `fieldNum`-tagged
    * length-delimited KeyValue (Resource.attributes = field 1). */
  private def decodeAttrList(b: Array[Byte], start: Int, end: Int,
      fieldNum: Int, utf8: Boolean): Map[String, String] = {
    var pos = start
    var attrs = Map.empty[String, String]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (f, 2) if f == fieldNum =>
          val (len, p2) = lenAt(b, pos)
          attrs = attrs ++ decodeKeyValue(b, p2, p2 + len, utf8)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    attrs
  }

  private def decodeKeyValue(b: Array[Byte], start: Int,
      end: Int, utf8: Boolean): Map[String, String] = {
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
    if (key.isEmpty) Map.empty
    else Map((if (utf8) key else sanitizeLabel(key)) -> value)
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
                decodeKeyValue(b, q2, q2 + l2, utf8 = false).foreach { case (k, v) =>
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

  /** Fixture Exemplar (ids as lowercase hex strings). */
  final case class ExemplarSpec(attrs: Map[String, String], timeNano: Long,
      value: Double, traceIdHex: String = "", spanIdHex: String = "")

  final case class Point(attrs: Map[String, String], timeNano: Long,
      value: Double, asInt: Boolean = false, noValue: Boolean = false,
      flags: Long = 0L, exemplars: Seq[ExemplarSpec] = Nil)

  /** Fixture ExponentialHistogramDataPoint (dense OTLP buckets). */
  final case class ExpHistPoint(attrs: Map[String, String], timeNano: Long,
      count: Long, sum: Double, scale: Int, zeroCount: Long,
      posOffset: Int, posCounts: Seq[Long],
      negOffset: Int = 0, negCounts: Seq[Long] = Nil,
      zeroThreshold: Double = 0.0, flags: Long = 0L)

  /** Fixture fixed-bucket HistogramDataPoint. */
  final case class HistPoint(attrs: Map[String, String], timeNano: Long,
      count: Long, sum: Double, bucketCounts: Seq[Long],
      explicitBounds: Seq[Double], flags: Long = 0L)

  /** Fixture SummaryDataPoint. */
  final case class SummaryPoint(attrs: Map[String, String], timeNano: Long,
      count: Long, sum: Double, quantiles: Seq[(Double, Double)],
      flags: Long = 0L)

  final case class MetricSpec(name: String, points: Seq[Point],
      sum: Boolean = false, deltaTemporality: Boolean = false,
      expPoints: Seq[ExpHistPoint] = Nil, histPoints: Seq[HistPoint] = Nil,
      summaryPoints: Seq[SummaryPoint] = Nil, monotonic: Boolean = false)

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
        p.exemplars.foreach { x =>
          val xb = mutable.ArrayBuffer.empty[Byte]
          x.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
            xb ++= lenDelim(7, keyValue(k, v))
          }
          xb += ((2 << 3) | 1).toByte; xb ++= fixed64LE(x.timeNano)
          xb += ((3 << 3) | 1).toByte; xb ++= fixed64Bytes(x.value)
          def unhex(h: String): Array[Byte] =
            h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
          if (x.spanIdHex.nonEmpty) xb ++= lenDelim(4, unhex(x.spanIdHex))
          if (x.traceIdHex.nonEmpty) xb ++= lenDelim(5, unhex(x.traceIdHex))
          dp ++= lenDelim(5, xb.toArray)
        }
        lenDelim(1, dp.toArray)
      }.toArray
      val sumExtra =
        if (m.sum) {
          val t = mutable.ArrayBuffer.empty[Byte]
          t += ((2 << 3) | 0).toByte
          t ++= writeVarint(if (m.deltaTemporality) 1L else 2L)
          if (m.monotonic) {
            t += ((3 << 3) | 0).toByte
            t ++= writeVarint(1L)
          }
          t.toArray
        } else Array.emptyByteArray
      def temporality: Array[Byte] = {
        val t = mutable.ArrayBuffer.empty[Byte]
        t += ((2 << 3) | 0).toByte
        t ++= writeVarint(if (m.deltaTemporality) 1L else 2L)
        t.toArray
      }
      def expBuckets(field: Int, offset: Int, counts: Seq[Long]): Array[Byte] = {
        val bb = mutable.ArrayBuffer.empty[Byte]
        bb += ((1 << 3) | 0).toByte
        bb ++= writeVarint(RemoteWrite.zigzagEncode(offset.toLong))
        val packed = counts.flatMap(writeVarint).toArray
        bb ++= lenDelim(2, packed)
        lenDelim(field, bb.toArray).toArray
      }
      val expPts = m.expPoints.flatMap { p =>
        val dp = mutable.ArrayBuffer.empty[Byte]
        p.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          dp ++= lenDelim(1, keyValue(k, v))
        }
        dp += ((3 << 3) | 1).toByte; dp ++= fixed64LE(p.timeNano)
        dp += ((4 << 3) | 1).toByte; dp ++= fixed64LE(p.count)
        dp += ((5 << 3) | 1).toByte; dp ++= fixed64Bytes(p.sum)
        dp += ((6 << 3) | 0).toByte
        dp ++= writeVarint(RemoteWrite.zigzagEncode(p.scale.toLong))
        dp += ((7 << 3) | 1).toByte; dp ++= fixed64LE(p.zeroCount)
        if (p.posCounts.nonEmpty) dp ++= expBuckets(8, p.posOffset, p.posCounts)
        if (p.negCounts.nonEmpty) dp ++= expBuckets(9, p.negOffset, p.negCounts)
        if (p.flags != 0L) {
          dp += ((10 << 3) | 0).toByte; dp ++= writeVarint(p.flags)
        }
        if (p.zeroThreshold != 0.0) {
          dp += ((14 << 3) | 1).toByte; dp ++= fixed64Bytes(p.zeroThreshold)
        }
        lenDelim(1, dp.toArray)
      }.toArray
      val histPts = m.histPoints.flatMap { p =>
        val dp = mutable.ArrayBuffer.empty[Byte]
        dp += ((3 << 3) | 1).toByte; dp ++= fixed64LE(p.timeNano)
        dp += ((4 << 3) | 1).toByte; dp ++= fixed64LE(p.count)
        dp += ((5 << 3) | 1).toByte; dp ++= fixed64Bytes(p.sum)
        dp ++= lenDelim(6,
          p.bucketCounts.flatMap(fixed64LE).toArray)
        dp ++= lenDelim(7,
          p.explicitBounds.flatMap(fixed64Bytes).toArray)
        if (p.flags != 0L) {
          dp += ((10 << 3) | 0).toByte; dp ++= writeVarint(p.flags)
        }
        p.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          dp ++= lenDelim(9, keyValue(k, v))
        }
        lenDelim(1, dp.toArray)
      }.toArray
      val summaryPts = m.summaryPoints.flatMap { p =>
        val dp = mutable.ArrayBuffer.empty[Byte]
        dp += ((3 << 3) | 1).toByte; dp ++= fixed64LE(p.timeNano)
        dp += ((4 << 3) | 1).toByte; dp ++= fixed64LE(p.count)
        dp += ((5 << 3) | 1).toByte; dp ++= fixed64Bytes(p.sum)
        p.quantiles.foreach { case (q, v) =>
          val vq = mutable.ArrayBuffer.empty[Byte]
          vq += ((1 << 3) | 1).toByte; vq ++= fixed64Bytes(q)
          vq += ((2 << 3) | 1).toByte; vq ++= fixed64Bytes(v)
          dp ++= lenDelim(6, vq.toArray)
        }
        p.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          dp ++= lenDelim(7, keyValue(k, v))
        }
        if (p.flags != 0L) {
          dp += ((8 << 3) | 0).toByte; dp ++= writeVarint(p.flags)
        }
        lenDelim(1, dp.toArray)
      }.toArray
      val body = lenDelim(1, m.name.getBytes("UTF-8")) ++
        (if (m.expPoints.nonEmpty) lenDelim(10, expPts ++ temporality)
         else if (m.histPoints.nonEmpty) lenDelim(9, histPts ++ temporality)
         else if (m.summaryPoints.nonEmpty) lenDelim(11, summaryPts)
         else lenDelim(if (m.sum) 7 else 5, pts ++ sumExtra))
      lenDelim(2, body.toArray) // ScopeMetrics.metrics
    }
    val scopeMetrics = metricBufs.flatten.toArray
    val rm = lenDelim(1, resource) ++ lenDelim(2, scopeMetrics)
    lenDelim(1, rm.toArray).toArray // request.resource_metrics
  }

  private def fixed64LE(v: Long): Seq[Byte] =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte)
}
