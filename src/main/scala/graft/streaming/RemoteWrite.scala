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
  * [[Sample]]s). Unknown fields are skipped, so v2 payload extensions
  * (exemplars, metadata) pass through harmlessly.
  */
object RemoteWrite {

  val NameLabel = "__name__"

  def decode(bytes: Array[Byte]): Seq[Sample] = {
    val out = mutable.ArrayBuffer.empty[Sample]
    var pos = 0
    while (pos < bytes.length) {
      val (tag, p1) = varint(bytes, pos)
      pos = p1
      if ((tag >> 3) == 1 && (tag & 7) == 2) { // timeseries
        val (len, p2) = varint(bytes, pos)
        out ++= decodeTimeSeries(bytes, p2, p2 + len.toInt)
        pos = p2 + len.toInt
      } else pos = skip(bytes, pos, (tag & 7).toInt)
    }
    out.toSeq
  }

  private def decodeTimeSeries(b: Array[Byte], start: Int, end: Int): Seq[Sample] = {
    var pos = start
    val labels = mutable.LinkedHashMap.empty[String, String]
    val samples = mutable.ArrayBuffer.empty[(Double, Long)]
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      (tag >> 3, tag & 7) match {
        case (1, 2) => // label
          val (len, p2) = varint(b, pos)
          val (n, v) = decodeLabel(b, p2, p2 + len.toInt)
          labels(n) = v
          pos = p2 + len.toInt
        case (2, 2) => // sample
          val (len, p2) = varint(b, pos)
          samples += decodeSample(b, p2, p2 + len.toInt)
          pos = p2 + len.toInt
        case (_, wt) => pos = skip(b, pos, wt.toInt)
      }
    }
    val name = labels.getOrElse(NameLabel, "")
    val rest = (labels - NameLabel).toMap
    samples.map { case (v, ts) => Sample(name, rest, ts, v) }.toSeq
  }

  private def decodeLabel(b: Array[Byte], start: Int, end: Int): (String, String) = {
    var pos = start
    var name = ""
    var value = ""
    while (pos < end) {
      val (tag, p1) = varint(b, pos)
      pos = p1
      val (len, p2) = varint(b, pos)
      val s = new String(b, p2, len.toInt, "UTF-8")
      if ((tag >> 3) == 1) name = s else if ((tag >> 3) == 2) value = s
      pos = p2 + len.toInt
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

  private def varint(b: Array[Byte], start: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var pos = start
    while ({
      val x = b(pos) & 0xff
      result |= (x & 0x7fL) << shift
      pos += 1
      shift += 7
      (x & 0x80) != 0
    }) ()
    (result, pos)
  }

  private def fixed64(b: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    v
  }

  private def skip(b: Array[Byte], pos: Int, wireType: Int): Int = wireType match {
    case 0 => varint(b, pos)._2
    case 1 => pos + 8
    case 2 => val (len, p) = varint(b, pos); p + len.toInt
    case 5 => pos + 4
    case wt => sys.error(s"unsupported wire type $wt")
  }

  // ------------------------------------------------------------- encoder
  // Minimal writer for tests and the soak harness (differential fixture
  // analog of the reference's equivalence_test.rs).

  def encode(samples: Seq[Sample]): Array[Byte] = {
    val out = mutable.ArrayBuffer.empty[Byte]
    samples.groupBy(s => (s.name, s.labels)).foreach { case ((name, labels), group) =>
      val ts = mutable.ArrayBuffer.empty[Byte]
      (Seq(NameLabel -> name) ++ labels.toSeq.sortBy(_._1)).foreach { case (k, v) =>
        val lbl = lenDelim(1, k.getBytes("UTF-8")) ++ lenDelim(2, v.getBytes("UTF-8"))
        ts ++= lenDelim(1, lbl.toArray)
      }
      group.foreach { s =>
        val sm = mutable.ArrayBuffer.empty[Byte]
        sm += ((1 << 3) | 1).toByte
        val bits = java.lang.Double.doubleToLongBits(s.value)
        for (i <- 0 until 8) sm += ((bits >> (8 * i)) & 0xff).toByte
        sm += ((2 << 3) | 0).toByte
        sm ++= writeVarint(s.timestamp)
        ts ++= lenDelim(2, sm.toArray)
      }
      out ++= lenDelim(1, ts.toArray)
    }
    out.toArray
  }

  private def lenDelim(field: Int, payload: Array[Byte]): mutable.ArrayBuffer[Byte] = {
    val b = mutable.ArrayBuffer.empty[Byte]
    b += ((field << 3) | 2).toByte
    b ++= writeVarint(payload.length.toLong)
    b ++= payload
    b
  }

  private def writeVarint(value: Long): Seq[Byte] = {
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
