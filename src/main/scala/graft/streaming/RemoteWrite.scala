package graft.streaming

import scala.collection.mutable

import graft.metric.Sample

/** Hand-rolled decoder for the Prometheus remote-write v1 wire format — the
  * public protobuf layout (prometheus/prompb/remote.proto, mirrored by the
  * reference at src/pb_types/protos/remote_write.proto:22-77):
  *
  * {{{
  * WriteRequest { repeated TimeSeries timeseries = 1; }
  * TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2; }
  * Label        { string name = 1; string value = 2; }
  * Sample       { double value = 1; int64 timestamp = 2; }   // ms epoch
  * }}}
  *
  * Zero dependencies: protobuf wire encoding is varints + length-delimited
  * records (the reference's pooled zero-copy parser is the same idea,
  * src/remote_write/src/pb_reader.rs:85-467 — JVM-side we parse straight to
  * [[Sample]]s). The full request surface the reference parses — exemplars
  * (TimeSeries field 3) and metric metadata (WriteRequest field 3,
  * remote_write.proto:22-77) — decodes via [[decodeRequest]]; [[decode]]
  * stays the samples-only fast path the ingest pipeline consumes.
  */
object RemoteWrite {

  val NameLabel = "__name__"

  /** Exemplar attached to a series (proto Exemplar: labels/value/ts). */
  final case class Exemplar(name: String, seriesLabels: Map[String, String],
      labels: Map[String, String], value: Double, timestamp: Long)

  /** MetricMetadata (proto field numbers 1/2/4/5; `metricType` is the raw
    * enum ordinal — 1=counter, 2=gauge, ... as in prompb). */
  final case class Metadata(metricType: Int, familyName: String,
      help: String, unit: String)

  /** A native (exponential/sparse) histogram sample — the prompb
    * `Histogram` message (prometheus/prompb/types.proto, mirrored at
    * io/prometheus/write/v2/types.proto with identical field numbers plus
    * `custom_values` = 16 for custom-bucket histograms, "NHCB").
    *
    * The wire's sparse encoding (bucket SPANS of consecutive indexes +
    * count DELTAS for integer histograms / absolute float counts for
    * float histograms) is resolved at decode to absolute
    * `(bucket index, count)` pairs — the form every consumer needs and
    * the one that stores columnar without re-walking deltas per read.
    * `floatHistogram` records which of the two count encodings arrived so
    * the encoder can round-trip losslessly.
    *
    * Standard schemas (-4..8): positive bucket `i` covers
    * `(base^(i-1), base^i]` with `base = 2^(2^-schema)`; negative bucket
    * `i` covers `[-base^i, -base^(i-1))`; the zero bucket covers
    * `[-zeroThreshold, zeroThreshold]`. Schema -53 = custom bucket
    * bounds: `customValues` are ascending upper bounds and positive
    * bucket indexes index into them (le-style classic buckets riding the
    * native wire). */
  final case class HistogramSample(
      name: String, labels: Map[String, String], timestamp: Long,
      count: Double, sum: Double, schema: Int,
      zeroThreshold: Double, zeroCount: Double,
      positiveBuckets: Seq[(Int, Double)],
      negativeBuckets: Seq[(Int, Double)],
      customValues: Seq[Double] = Nil,
      resetHint: Int = 0,
      floatHistogram: Boolean = false)

  final case class Request(samples: Seq[Sample], exemplars: Seq[Exemplar],
      metadata: Seq[Metadata], histograms: Seq[HistogramSample] = Nil)

  /** Snappy unframing: real Prometheus remote-write HTTP bodies are snappy
    * BLOCK-compressed (prometheus remote-write 1.0 spec: the payload "MUST
    * be compressed with snappy"); the reference parses pre-decoded bytes
    * (remote_write/src/pooled_parser.rs:43-73) so raw protobuf must keep
    * working for replayed captures. Snappy's block format carries no magic
    * bytes, so sniff by validation: a valid snappy buffer is uncompressed,
    * anything else passes through raw. (A raw WriteRequest starts 0x0a and
    * its first varint would declare an uncompressed length equal to a label
    * byte-length — snappy validation rejects it immediately, so the sniff
    * cannot misfire on real payloads.) Because that validation is
    * structural, not a tagged encoding, a raw body that nonetheless
    * validates as snappy must not be silently decompressed into garbage:
    * the decompressed bytes are kept only when they walk as a protobuf
    * message; otherwise a raw-parsable input passes through untouched. */
  def unframe(bytes: Array[Byte]): Array[Byte] =
    try {
      if (bytes.nonEmpty &&
          org.xerial.snappy.Snappy.isValidCompressedBuffer(bytes, 0, bytes.length)) {
        val un = org.xerial.snappy.Snappy.uncompress(bytes)
        if (walksAsMessage(un) || !walksAsMessage(bytes)) un else bytes
      } else bytes
    } catch { case scala.util.control.NonFatal(_) => bytes }

  /** Structural protobuf walk: every top-level record has a positive field
    * number, a known wire type, and a body within bounds. Cheap (no
    * allocation) and sufficient to tell a WriteRequest from snappy-
    * decompressed garbage. */
  private def walksAsMessage(b: Array[Byte]): Boolean =
    try {
      var pos = 0
      var ok = true
      while (ok && pos < b.length) {
        val (tag, p1) = varint(b, pos)
        val wt = (tag & 7).toInt
        if ((tag >> 3) <= 0 || (wt != 0 && wt != 1 && wt != 2 && wt != 5)) ok = false
        else {
          pos = skip(b, p1, wt)
          if (pos > b.length) ok = false
        }
      }
      ok
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Samples-only fast path for the ingest pipeline: exemplar and metadata
    * bodies are SKIPPED at the wire level (zero allocation for them), as
    * before the full-request decode existed. Accepts snappy-framed or raw
    * payloads (see [[unframe]]) in EITHER remote-write version — 1.0
    * WriteRequest or 2.0 io.prometheus.write.v2.Request (see
    * [[decodeRequestV2]]); the versions use disjoint top-level field
    * numbers (v2 reserves 1-3), so [[looksLikeV2]] dispatches without a
    * content-type hint. */
  def decode(bytes: Array[Byte]): Seq[Sample] = {
    val un = unframe(bytes)
    if (looksLikeV2(un)) decodeV2Impl(un, collectExtras = false).samples
    else decodeImpl(un, collectExtras = false).samples
  }

  /** [[decode]] plus the native histograms the payload carries — the
    * STREAMING sink's decode ([[graft.streaming.MetricStreamIngest]]):
    * histogram bodies are decoded either way (they share the TimeSeries
    * record), so a sink that calls [[decode]] pays their cost and then
    * silently LOSES them — the same payload POSTed to the HTTP edge
    * ingests them via [[decodeRequest]]. Exemplars/metadata stay skipped
    * at the wire level. */
  def decodeSamplesAndHistograms(
      bytes: Array[Byte]): (Seq[Sample], Seq[HistogramSample]) = {
    val un = unframe(bytes)
    val r = if (looksLikeV2(un)) decodeV2Impl(un, collectExtras = false)
            else decodeImpl(un, collectExtras = false)
    (r.samples, r.histograms)
  }

  /** Full request decode: timeseries (labels + samples + exemplars)
    * and metric metadata records. Unknown fields are skipped. Accepts
    * snappy-framed or raw payloads (see [[unframe]]), remote-write 1.0
    * or 2.0 (version-sniffed like [[decode]]). */
  def decodeRequest(bytes: Array[Byte]): Request = {
    val un = unframe(bytes)
    if (looksLikeV2(un)) decodeV2Impl(un, collectExtras = true)
    else decodeImpl(un, collectExtras = true)
  }

  /** Remote-write 2.0 decode (io.prometheus.write.v2.Request — what
    * Prometheus 3.x sends; prometheus/prompb/io/prometheus/write/v2/
    * types.proto):
    *
    * {{{
    * Request    { repeated string symbols = 4; repeated TimeSeries timeseries = 5; }
    * TimeSeries { repeated uint32 labels_refs = 1;   // packed; (name,value) index pairs
    *              repeated Sample samples = 2;
    *              repeated Histogram histograms = 3; // native histograms
    *              repeated Exemplar exemplars = 4;
    *              Metadata metadata = 5; int64 created_timestamp = 6; }
    * Exemplar   { repeated uint32 labels_refs = 1; double value = 2; int64 timestamp = 3; }
    * Metadata   { MetricType type = 1; uint32 help_ref = 3; uint32 unit_ref = 4; }
    * }}}
    *
    * All strings intern into `symbols` (index 0 is "" by spec); label refs
    * come in (name, value) pairs. Packed and unpacked refs both parse
    * (proto3 parsers must accept either). Native histograms (TimeSeries
    * field 3) decode to [[HistogramSample]]s — Prometheus 3.x sends them
    * by default on new scrapes, so dropping them would silently lose data
    * on an otherwise-accepted write. v2 metadata carries no
    * family name — the series' own `__name__` is the family, which is how
    * Prometheus 3 populates it. Out-of-range refs error (the HTTP layer
    * answers 400, never a silent mis-binding). */
  def decodeRequestV2(bytes: Array[Byte]): Request =
    decodeV2Impl(unframe(bytes), collectExtras = true)

  /** v1/v2 dispatch on the top-level field numbers — disjoint by design
    * (v1 uses 1/3, v2 reserves 1-3 and uses 4/5). */
  private[streaming] def looksLikeV2(b: Array[Byte]): Boolean =
    try {
      var pos = 0
      while (pos < b.length) {
        val (tag, p1) = varint(b, pos)
        (tag >> 3) match {
          case 4 | 5 => return true
          case 1 | 2 | 3 => return false
          case _ => pos = skip(b, p1, (tag & 7).toInt)
        }
      }
      false
    } catch { case scala.util.control.NonFatal(_) => false }

  private def decodeV2Impl(bytes: Array[Byte], collectExtras: Boolean): Request = {
    // two passes: symbols may legally serialize after the timeseries that
    // reference them, so collect record bounds first, resolve after
    val symbols = mutable.ArrayBuffer.empty[String]
    val tsRanges = mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (4, 2) =>
          val (len, p2) = lenAt(bytes, pos)
          symbols += new String(bytes, p2, len, "UTF-8")
          pos = p2 + len
        case (5, 2) =>
          val (len, p2) = lenAt(bytes, pos)
          tsRanges += ((p2, p2 + len))
          pos = p2 + len
        case (_, wt) => pos = skip(bytes, pos, wt.toInt)
      }
    }
    def sym(ref: Int): String = {
      if (ref < 0 || ref >= symbols.length)
        sys.error(s"labels_refs index $ref out of range (${symbols.length} symbols)")
      symbols(ref)
    }
    def labelsOf(refs: Seq[Int]): Map[String, String] = {
      if (refs.length % 2 != 0) sys.error("odd labels_refs count")
      refs.grouped(2).map { case Seq(n, v) => sym(n) -> sym(v) }.toMap
    }
    val samples = mutable.ArrayBuffer.empty[Sample]
    val exemplars = mutable.ArrayBuffer.empty[Exemplar]
    val metadata = mutable.ArrayBuffer.empty[Metadata]
    val histograms = mutable.ArrayBuffer.empty[HistogramSample]
    tsRanges.foreach { case (start, end) =>
      var p = start
      val refs = mutable.ArrayBuffer.empty[Int]
      val ss = mutable.ArrayBuffer.empty[(Double, Long)]
      val hs = mutable.ArrayBuffer.empty[HistogramSample]
      val exs = mutable.ArrayBuffer.empty[(Seq[Int], Double, Long)]
      var md: Option[(Int, Int, Int)] = None // (type, help_ref, unit_ref)
      while (p < end) {
        val (tag, p1) = varint(bytes, p)
        p = p1
        (tag >> 3, tag & 7) match {
          case (1, 2) => // packed labels_refs
            val (len, p2) = lenAt(bytes, p)
            var q = p2
            while (q < p2 + len) {
              val (r, q2) = varint(bytes, q); refs += r.toInt; q = q2
            }
            p = p2 + len
          case (1, 0) => // unpacked single ref
            val (r, p2) = varint(bytes, p); refs += r.toInt; p = p2
          case (2, 2) =>
            val (len, p2) = lenAt(bytes, p)
            ss += decodeSample(bytes, p2, p2 + len)
            p = p2 + len
          case (3, 2) => // native histogram
            val (len, p2) = lenAt(bytes, p)
            hs += decodeHistogram(bytes, p2, p2 + len)
            p = p2 + len
          case (4, 2) if collectExtras =>
            val (len, p2) = lenAt(bytes, p)
            exs += decodeExemplarV2(bytes, p2, p2 + len)
            p = p2 + len
          case (5, 2) if collectExtras =>
            val (len, p2) = lenAt(bytes, p)
            md = Some(decodeMetadataV2(bytes, p2, p2 + len))
            p = p2 + len
          case (_, wt) => p = skip(bytes, p, wt.toInt)
        }
      }
      val labels = labelsOf(refs.toSeq)
      val name = labels.getOrElse(NameLabel, "")
      val rest = labels - NameLabel
      samples ++= ss.map { case (v, ts) => Sample(name, rest, ts, v) }
      histograms ++= hs.map(_.copy(name = name, labels = rest))
      exemplars ++= exs.map { case (eRefs, v, ts) =>
        Exemplar(name, rest, labelsOf(eRefs), v, ts) }
      md.foreach { case (tpe, helpRef, unitRef) =>
        metadata += Metadata(tpe, name, sym(helpRef), sym(unitRef)) }
    }
    Request(samples.toSeq, exemplars.toSeq, metadata.toSeq, histograms.toSeq)
  }

  /** Decode one prompb `Histogram` record (shared by remote-write 1.0
    * TimeSeries field 4 and 2.0 TimeSeries field 3 — identical layout).
    * Sparse spans + integer deltas (or float absolute counts) resolve to
    * absolute `(index, count)` pairs here, once, at the edge. The
    * `name`/`labels` fields are stamped by the caller (they live on the
    * enclosing TimeSeries). */
  private def decodeHistogram(b: Array[Byte], start: Int,
      end: Int): HistogramSample = {
    var pos = start
    var countI = 0L; var countF = 0.0; var countIsFloat = false
    var sum = 0.0; var schema = 0; var zeroTh = 0.0
    var zeroI = 0L; var zeroF = 0.0; var zeroIsFloat = false
    var resetHint = 0; var ts = 0L
    val negSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    val posSpans = mutable.ArrayBuffer.empty[(Int, Int)]
    val negDeltas = mutable.ArrayBuffer.empty[Long]
    val posDeltas = mutable.ArrayBuffer.empty[Long]
    val negCounts = mutable.ArrayBuffer.empty[Double]
    val posCounts = mutable.ArrayBuffer.empty[Double]
    val customValues = mutable.ArrayBuffer.empty[Double]
    def packedZigzag(out: mutable.ArrayBuffer[Long]): Unit = {
      val (len, p2) = lenAt(b, pos)
      var q = p2
      while (q < p2 + len) {
        val (v, q2) = varint(b, q); out += zigzagDecode(v); q = q2
      }
      pos = p2 + len
    }
    def packedDoubles(out: mutable.ArrayBuffer[Double]): Unit = {
      val (len, p2) = lenAt(b, pos)
      var q = p2
      while (q < p2 + len) {
        out += java.lang.Double.longBitsToDouble(fixed64(b, q)); q += 8
      }
      pos = p2 + len
    }
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (v, p2) = varint(b, pos); countI = v; pos = p2
        case (2, 1) =>
          countF = java.lang.Double.longBitsToDouble(fixed64(b, pos))
          countIsFloat = true; pos += 8
        case (3, 1) =>
          sum = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (4, 0) =>
          val (v, p2) = varint(b, pos)
          schema = zigzagDecode(v).toInt; pos = p2
        case (5, 1) =>
          zeroTh = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (6, 0) => val (v, p2) = varint(b, pos); zeroI = v; pos = p2
        case (7, 1) =>
          zeroF = java.lang.Double.longBitsToDouble(fixed64(b, pos))
          zeroIsFloat = true; pos += 8
        case (8, 2) =>
          val (len, p2) = lenAt(b, pos)
          negSpans += decodeBucketSpan(b, p2, p2 + len); pos = p2 + len
        case (9, 2) => packedZigzag(negDeltas)
        case (9, 0) =>
          val (v, p2) = varint(b, pos); negDeltas += zigzagDecode(v); pos = p2
        case (10, 2) => packedDoubles(negCounts)
        case (10, 1) =>
          negCounts += java.lang.Double.longBitsToDouble(fixed64(b, pos))
          pos += 8
        case (11, 2) =>
          val (len, p2) = lenAt(b, pos)
          posSpans += decodeBucketSpan(b, p2, p2 + len); pos = p2 + len
        case (12, 2) => packedZigzag(posDeltas)
        case (12, 0) =>
          val (v, p2) = varint(b, pos); posDeltas += zigzagDecode(v); pos = p2
        case (13, 2) => packedDoubles(posCounts)
        case (13, 1) =>
          posCounts += java.lang.Double.longBitsToDouble(fixed64(b, pos))
          pos += 8
        case (14, 0) => val (v, p2) = varint(b, pos); resetHint = v.toInt; pos = p2
        case (15, 0) => val (v, p2) = varint(b, pos); ts = v; pos = p2
        case (16, 2) => packedDoubles(customValues)
        case (16, 1) =>
          customValues += java.lang.Double.longBitsToDouble(fixed64(b, pos))
          pos += 8
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    val isFloat = countIsFloat || zeroIsFloat ||
      posCounts.nonEmpty || negCounts.nonEmpty
    HistogramSample("", Map.empty, ts,
      count = if (countIsFloat) countF else countI.toDouble,
      sum = sum, schema = schema, zeroThreshold = zeroTh,
      zeroCount = if (zeroIsFloat) zeroF else zeroI.toDouble,
      positiveBuckets = expandSparseBuckets(
        posSpans.toSeq, posDeltas.toSeq, posCounts.toSeq),
      negativeBuckets = expandSparseBuckets(
        negSpans.toSeq, negDeltas.toSeq, negCounts.toSeq),
      customValues = customValues.toSeq,
      resetHint = resetHint, floatHistogram = isFloat)
  }

  private def decodeBucketSpan(b: Array[Byte], start: Int,
      end: Int): (Int, Int) = {
    var pos = start
    var offset = 0; var length = 0
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) =>
          val (v, p2) = varint(b, pos); offset = zigzagDecode(v).toInt; pos = p2
        case (2, 0) => val (v, p2) = varint(b, pos); length = v.toInt; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (offset, length)
  }

  /** Resolve sparse spans + deltas (int histograms) or spans + absolute
    * counts (float histograms) to absolute `(index, count)` pairs. The
    * first span's offset is the absolute starting index; each later
    * span's offset is the gap from the end of the previous span (the
    * public prompb comment contract). Integer deltas accumulate: bucket
    * k's count = sum of deltas[0..k]. */
  private[streaming] def expandSparseBuckets(spans: Seq[(Int, Int)],
      deltas: Seq[Long], counts: Seq[Double]): Seq[(Int, Double)] = {
    val total = spans.map(_._2.toLong).sum
    val n = if (counts.nonEmpty) counts.length else deltas.length
    if (total != n)
      sys.error(s"histogram spans declare $total buckets but $n counts arrived")
    val out = mutable.ArrayBuffer.empty[(Int, Double)]
    var idx = 0
    var i = 0
    var cur = 0L
    spans.foreach { case (offset, length) =>
      idx += offset
      var j = 0
      while (j < length) {
        val c =
          if (counts.nonEmpty) counts(i)
          else { cur += deltas(i); cur.toDouble }
        out += ((idx, c))
        idx += 1; i += 1; j += 1
      }
    }
    out.toSeq
  }

  private[streaming] def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1L)
  private[streaming] def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)

  private def decodeExemplarV2(b: Array[Byte], start: Int,
      end: Int): (Seq[Int], Double, Long) = {
    var pos = start
    val refs = mutable.ArrayBuffer.empty[Int]
    var value = 0.0
    var ts = 0L
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          var q = p2
          while (q < p2 + len) {
            val (r, q2) = varint(b, q); refs += r.toInt; q = q2
          }
          pos = p2 + len
        case (1, 0) =>
          val (r, p2) = varint(b, pos); refs += r.toInt; pos = p2
        case (2, 1) =>
          value = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (3, 0) =>
          val (t, p2) = varint(b, pos); ts = t; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (refs.toSeq, value, ts)
  }

  private def decodeMetadataV2(b: Array[Byte], start: Int,
      end: Int): (Int, Int, Int) = {
    var pos = start
    var tpe = 0
    var helpRef = 0
    var unitRef = 0
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (t, p2) = varint(b, pos); tpe = t.toInt; pos = p2
        case (3, 0) => val (r, p2) = varint(b, pos); helpRef = r.toInt; pos = p2
        case (4, 0) => val (r, p2) = varint(b, pos); unitRef = r.toInt; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (tpe, helpRef, unitRef)
  }

  private def decodeImpl(bytes: Array[Byte], collectExtras: Boolean): Request = {
    val samples = mutable.ArrayBuffer.empty[Sample]
    val exemplars = mutable.ArrayBuffer.empty[Exemplar]
    val metadata = mutable.ArrayBuffer.empty[Metadata]
    val histograms = mutable.ArrayBuffer.empty[HistogramSample]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // timeseries
          val (len, p2) = lenAt(bytes, pos)
          decodeTimeSeries(bytes, p2, p2 + len, samples, histograms,
            if (collectExtras) Some(exemplars) else None)
          pos = p2 + len
        case (3, 2) if collectExtras => // metadata
          val (len, p2) = lenAt(bytes, pos)
          metadata += decodeMetadata(bytes, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(bytes, pos, wt.toInt)
      }
    }
    Request(samples.toSeq, exemplars.toSeq, metadata.toSeq, histograms.toSeq)
  }

  private def decodeTimeSeries(b: Array[Byte], start: Int, end: Int,
      samplesOut: mutable.ArrayBuffer[Sample],
      histogramsOut: mutable.ArrayBuffer[HistogramSample],
      exemplarsOut: Option[mutable.ArrayBuffer[Exemplar]]): Unit = {
    var pos = start
    val labels = mutable.LinkedHashMap.empty[String, String]
    val samples = mutable.ArrayBuffer.empty[(Double, Long)]
    val histograms = mutable.ArrayBuffer.empty[HistogramSample]
    val exemplars = mutable.ArrayBuffer.empty[(Map[String, String], Double, Long)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // label
          val (len, p2) = lenAt(b, pos)
          val (n, v) = decodeLabel(b, p2, p2 + len)
          labels(n) = v
          pos = p2 + len
        case (2, 2) => // sample
          val (len, p2) = lenAt(b, pos)
          samples += decodeSample(b, p2, p2 + len)
          pos = p2 + len
        case (3, 2) => // exemplar — parsed only for the full-request path
          val (len, p2) = lenAt(b, pos)
          if (exemplarsOut.isDefined)
            exemplars += decodeExemplar(b, p2, p2 + len)
          pos = p2 + len
        case (4, 2) => // native histogram (prompb TimeSeries field 4)
          val (len, p2) = lenAt(b, pos)
          histograms += decodeHistogram(b, p2, p2 + len)
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    val name = labels.getOrElse(NameLabel, "")
    val rest = (labels - NameLabel).toMap
    samplesOut ++= samples.map { case (v, ts) => Sample(name, rest, ts, v) }
    histogramsOut ++= histograms.map(_.copy(name = name, labels = rest))
    exemplarsOut.foreach(_ ++= exemplars.map { case (ls, v, ts) =>
      Exemplar(name, rest, ls, v, ts) })
  }

  private def decodeExemplar(b: Array[Byte], start: Int,
      end: Int): (Map[String, String], Double, Long) = {
    var pos = start
    val labels = mutable.LinkedHashMap.empty[String, String]
    var value = 0.0
    var ts = 0L
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) =>
          val (len, p2) = lenAt(b, pos)
          val (n, v) = decodeLabel(b, p2, p2 + len)
          labels(n) = v
          pos = p2 + len
        case (2, 1) =>
          value = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (3, 0) =>
          val (t, p2) = varint(b, pos); ts = t; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (labels.toMap, value, ts)
  }

  private def decodeMetadata(b: Array[Byte], start: Int, end: Int): Metadata = {
    var pos = start
    var tpe = 0
    var family = ""
    var help = ""
    var unit = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 0) => val (t, p2) = varint(b, pos); tpe = t.toInt; pos = p2
        case (f, 2) if f == 2 || f == 4 || f == 5 =>
          val (len, p2) = lenAt(b, pos)
          val s = new String(b, p2, len, "UTF-8")
          if (f == 2) family = s else if (f == 4) help = s else unit = s
          pos = p2 + len
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    Metadata(tpe, family, help, unit)
  }

  private def decodeLabel(b: Array[Byte], start: Int, end: Int): (String, String) = {
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

  private def decodeSample(b: Array[Byte], start: Int, end: Int): (Double, Long) = {
    var pos = start
    var value = 0.0
    var ts = 0L
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 1) => value = java.lang.Double.longBitsToDouble(fixed64(b, pos)); pos += 8
        case (2, 0) => val (t, p2) = varint(b, pos); ts = t; pos = p2
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    (value, ts)
  }

  private[streaming] def varint(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = start
    while ({
      // a legal varint is at most 10 bytes; unbounded continuation bits in
      // attacker-crafted input must error, not shift into garbage
      if (shift > 63) sys.error(s"varint too long at $start")
      val x = b(pos) & 0xff
      result |= (x & 0x7fL) << shift
      pos += 1
      shift += 7
      (x & 0x80) != 0
    }) ()
    (result, pos)
  }

  /** Length-delimited field bounds, validated: the declared length must be
    * non-negative and fit inside the buffer. Without this, a crafted
    * length varint (e.g. 2^32-6) truncates to a NEGATIVE Int, `pos + len`
    * lands back ON the tag it came from, and the decode loop spins
    * forever — a remote CPU-pin DoS through the HTTP write endpoint
    * (no exception, so per-payload catches never fire). Every
    * length-delimited read routes through here so `pos` strictly
    * advances or the walk errors out. */
  private[streaming] def lenAt(b: Array[Byte], pos: Int): (Int, Int) = {
    val (len, p) = varint(b, pos)
    if (len < 0L || len > (b.length - p).toLong)
      sys.error(s"bad length-delimited field: len=$len at $pos")
    (len.toInt, p)
  }

  private[streaming] def fixed64(b: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    v
  }

  private[streaming] def skip(b: Array[Byte], pos: Int, wireType: Int): Int = wireType match {
    case 0 => varint(b, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = lenAt(b, pos); p + len
    case 5 => pos + 4
    case wt => sys.error(s"unsupported wire type $wt")
  }

  // ------------------------------------------------------------- encoder
  // Minimal writer for tests and the soak harness (differential fixture
  // analog of the reference's equivalence_test.rs).

  def encode(samples: Seq[Sample]): Array[Byte] =
    encodeRequest(Request(samples, Nil, Nil))

  /** Absolute `(index, count)` pairs → prompb spans + (deltas | counts):
    * the inverse of [[expandSparseBuckets]]. Buckets must arrive sorted
    * by index (the decode side always produces them sorted). */
  private def sparseOf(buckets: Seq[(Int, Double)],
      asFloat: Boolean): (Seq[(Int, Int)], Seq[Long], Seq[Double]) = {
    val spans = mutable.ArrayBuffer.empty[(Int, Int)]
    var prevEnd = 0
    buckets.foreach { case (idx, _) =>
      if (spans.nonEmpty && idx == prevEnd) {
        val (o, l) = spans.last
        spans(spans.length - 1) = (o, l + 1)
      } else spans += ((idx - prevEnd, 1))
      prevEnd = idx + 1
    }
    if (asFloat) (spans.toSeq, Nil, buckets.map(_._2))
    else {
      var cur = 0L
      val deltas = buckets.map { case (_, c) =>
        val d = c.toLong - cur; cur = c.toLong; d
      }
      (spans.toSeq, deltas, Nil)
    }
  }

  /** Encode one prompb `Histogram` record (shared v1/v2 layout). */
  private def encodeHistogram(h: HistogramSample): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    def varintField(field: Int, v: Long): Unit = {
      out += ((field << 3) | 0).toByte; out ++= writeVarint(v); ()
    }
    def doubleField(field: Int, v: Double): Unit = {
      out += ((field << 3) | 1).toByte; out ++= fixed64Bytes(v); ()
    }
    def spanBytes(offset: Int, length: Int): Array[Byte] = {
      val b = mutable.ArrayBuffer.empty[Byte]
      b += ((1 << 3) | 0).toByte
      b ++= writeVarint(zigzagEncode(offset.toLong))
      b += ((2 << 3) | 0).toByte
      b ++= writeVarint(length.toLong)
      b.toArray
    }
    def packedZigzag(field: Int, vs: Seq[Long]): Unit = {
      if (vs.nonEmpty) {
        out ++= lenDelim(field,
          vs.flatMap(v => writeVarint(zigzagEncode(v))).toArray); ()
      }
    }
    def packedDoubles(field: Int, vs: Seq[Double]): Unit = {
      if (vs.nonEmpty) {
        out ++= lenDelim(field, vs.flatMap(fixed64Bytes).toArray); ()
      }
    }
    if (h.floatHistogram) doubleField(2, h.count)
    else varintField(1, h.count.toLong)
    doubleField(3, h.sum)
    varintField(4, zigzagEncode(h.schema.toLong))
    doubleField(5, h.zeroThreshold)
    if (h.floatHistogram) doubleField(7, h.zeroCount)
    else varintField(6, h.zeroCount.toLong)
    val (negSpans, negDeltas, negCounts) =
      sparseOf(h.negativeBuckets, h.floatHistogram)
    val (posSpans, posDeltas, posCounts) =
      sparseOf(h.positiveBuckets, h.floatHistogram)
    negSpans.foreach { case (o, l) => out ++= lenDelim(8, spanBytes(o, l)) }
    packedZigzag(9, negDeltas)
    packedDoubles(10, negCounts)
    posSpans.foreach { case (o, l) => out ++= lenDelim(11, spanBytes(o, l)) }
    packedZigzag(12, posDeltas)
    packedDoubles(13, posCounts)
    if (h.resetHint != 0) varintField(14, h.resetHint.toLong)
    varintField(15, h.timestamp)
    packedDoubles(16, h.customValues)
    out.toArray
  }

  def encodeRequest(req: Request): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    val exBySeries = req.exemplars.groupBy(e => (e.name, e.seriesLabels))
    val histBySeries = req.histograms.groupBy(h => (h.name, h.labels))
    val seriesKeys = (req.samples.map(s => (s.name, s.labels)) ++
      exBySeries.keys ++ histBySeries.keys).distinct
    val byKey = req.samples.groupBy(s => (s.name, s.labels))
    seriesKeys.foreach { case key @ (name, labels) =>
      val ts = mutable.ArrayBuffer.empty[Byte]
      (Seq(NameLabel -> name) ++ labels.toSeq.sortBy(_._1)).foreach { case (k, v) =>
        val lbl = lenDelim(1, k.getBytes("UTF-8")) ++ lenDelim(2, v.getBytes("UTF-8"))
        ts ++= lenDelim(1, lbl.toArray)
      }
      byKey.getOrElse(key, Nil).foreach { s =>
        val sm = mutable.ArrayBuffer.empty[Byte]
        sm += ((1 << 3) | 1).toByte
        sm ++= fixed64Bytes(s.value)
        sm += ((2 << 3) | 0).toByte
        sm ++= writeVarint(s.timestamp)
        ts ++= lenDelim(2, sm.toArray)
      }
      histBySeries.getOrElse(key, Nil).foreach { h =>
        ts ++= lenDelim(4, encodeHistogram(h))
      }
      exBySeries.getOrElse(key, Nil).foreach { e =>
        val ex = mutable.ArrayBuffer.empty[Byte]
        e.labels.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val lbl = lenDelim(1, k.getBytes("UTF-8")) ++ lenDelim(2, v.getBytes("UTF-8"))
          ex ++= lenDelim(1, lbl.toArray)
        }
        ex += ((2 << 3) | 1).toByte
        ex ++= fixed64Bytes(e.value)
        ex += ((3 << 3) | 0).toByte
        ex ++= writeVarint(e.timestamp)
        ts ++= lenDelim(3, ex.toArray)
      }
      out ++= lenDelim(1, ts.toArray)
    }
    req.metadata.foreach { m =>
      val md = mutable.ArrayBuffer.empty[Byte]
      md += ((1 << 3) | 0).toByte
      md ++= writeVarint(m.metricType.toLong)
      md ++= lenDelim(2, m.familyName.getBytes("UTF-8"))
      md ++= lenDelim(4, m.help.getBytes("UTF-8"))
      md ++= lenDelim(5, m.unit.getBytes("UTF-8"))
      out ++= lenDelim(3, md.toArray)
    }
    out.toArray
  }

  /** Remote-write 2.0 encoder (tests + soaks): interns every string into
    * the symbols table (index 0 = "" per spec) and emits packed
    * (name, value) label ref pairs. Metadata records attach to the series
    * whose `__name__` matches their family; families with no sample
    * series emit a bare metadata-only series, exactly how Prometheus 3
    * ships detached metadata. */
  def encodeV2(samples: Seq[Sample]): Array[Byte] =
    encodeRequestV2(Request(samples, Nil, Nil))

  def encodeRequestV2(req: Request): Array[Byte] = {
    val symbols = mutable.LinkedHashMap.empty[String, Int]
    symbols("") = 0
    def ref(s: String): Int = symbols.getOrElseUpdate(s, symbols.size)
    def packedRefs(field: Int, refs: Seq[Int]): mutable.ArrayBuffer[Byte] =
      lenDelim(field, refs.flatMap(r => writeVarint(r.toLong)).toArray)
    def labelRefs(name: String, labels: Map[String, String]): Seq[Int] =
      (Seq(NameLabel -> name) ++ labels.toSeq.sortBy(_._1))
        .flatMap { case (k, v) => Seq(ref(k), ref(v)) }

    val exBySeries = req.exemplars.groupBy(e => (e.name, e.seriesLabels))
    val histBySeries = req.histograms.groupBy(h => (h.name, h.labels))
    val mdByFamily = req.metadata.groupBy(_.familyName)
    val byKey = req.samples.groupBy(s => (s.name, s.labels))
    // metadata attaches to its family's first series; families with no
    // series at all get a bare metadata-only series appended
    val seriesKeys = (req.samples.map(s => (s.name, s.labels)) ++
      exBySeries.keys ++ histBySeries.keys).distinct
    val familiesPresent = seriesKeys.map(_._1).toSet
    val allKeys = seriesKeys ++ mdByFamily.keys.toSeq.sorted
      .filterNot(familiesPresent).map(f => (f, Map.empty[String, String]))
    val tsRecords = mutable.ArrayBuffer.empty[Byte]
    val mdEmitted = mutable.Set.empty[String]
    allKeys.foreach { case key @ (name, labels) =>
      val ts = mutable.ArrayBuffer.empty[Byte]
      ts ++= packedRefs(1, labelRefs(name, labels))
      byKey.getOrElse(key, Nil).foreach { s =>
        val sm = mutable.ArrayBuffer.empty[Byte]
        sm += ((1 << 3) | 1).toByte
        sm ++= fixed64Bytes(s.value)
        sm += ((2 << 3) | 0).toByte
        sm ++= writeVarint(s.timestamp)
        ts ++= lenDelim(2, sm.toArray)
      }
      histBySeries.getOrElse(key, Nil).foreach { h =>
        ts ++= lenDelim(3, encodeHistogram(h))
      }
      exBySeries.getOrElse(key, Nil).foreach { e =>
        val ex = mutable.ArrayBuffer.empty[Byte]
        ex ++= packedRefs(1,
          e.labels.toSeq.sortBy(_._1).flatMap { case (k, v) =>
            Seq(ref(k), ref(v)) })
        ex += ((2 << 3) | 1).toByte
        ex ++= fixed64Bytes(e.value)
        ex += ((3 << 3) | 0).toByte
        ex ++= writeVarint(e.timestamp)
        ts ++= lenDelim(4, ex.toArray)
      }
      if (!mdEmitted(name)) mdByFamily.get(name).map(_.head).foreach { m =>
        mdEmitted += name
        val md = mutable.ArrayBuffer.empty[Byte]
        md += ((1 << 3) | 0).toByte
        md ++= writeVarint(m.metricType.toLong)
        md += ((3 << 3) | 0).toByte
        md ++= writeVarint(ref(m.help).toLong)
        md += ((4 << 3) | 0).toByte
        md ++= writeVarint(ref(m.unit).toLong)
        ts ++= lenDelim(5, md.toArray)
      }
      tsRecords ++= lenDelim(5, ts.toArray)
    }
    val out = mutable.ArrayBuffer.empty[Byte]
    symbols.keys.foreach(s => out ++= lenDelim(4, s.getBytes("UTF-8")))
    out ++= tsRecords
    out.toArray
  }

  private[streaming] def fixed64Bytes(d: Double): Seq[Byte] = {
    // RAW bits: doubleToLongBits canonicalizes every NaN payload, which
    // destroys Prometheus staleness markers (IsStaleNaN is a BIT-equality
    // check on 0x7ff0000000000002) in remote-read SAMPLES responses —
    // and would make the SAMPLES and XOR-chunked paths return different
    // bytes for the same stored data (XorChunk already writes raw bits).
    val bits = java.lang.Double.doubleToRawLongBits(d)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte)
  }

  private[streaming] def lenDelim(field: Int, payload: Array[Byte]): mutable.ArrayBuffer[Byte] = {
    val b = mutable.ArrayBuffer.empty[Byte]
    // the tag itself is a varint — one byte only for field numbers < 16
    // (histogram custom_values is field 16, a two-byte tag)
    b ++= writeVarint(((field << 3) | 2).toLong)
    b ++= writeVarint(payload.length.toLong)
    b ++= payload
    b
  }

  private[streaming] def writeVarint(value: Long): Seq[Byte] = {
    var v = value
    val b = mutable.ArrayBuffer.empty[Byte]
    while ({
      val x = (v & 0x7f).toInt
      v >>>= 7
      if (v != 0) b += (x | 0x80).toByte else b += x.toByte
      v != 0
    }) ()
    b.toSeq
  }
}
