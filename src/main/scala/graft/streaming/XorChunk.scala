package graft.streaming

import scala.collection.mutable

/** Gorilla XOR chunk codec — the Prometheus TSDB chunk encoding
  * (`prometheus/tsdb/chunkenc/xor.go`, itself the compression scheme of
  * Facebook's public Gorilla paper, VLDB 2015 §4.1): delta-of-delta
  * timestamps with prefix-coded bit widths, XOR'd float64 values with
  * leading/trailing-zero windows. Chunk layout: 2-byte big-endian sample
  * count, then the bit stream. This is the payload format of remote
  * read's STREAMED_XOR_CHUNKS response type ([[RemoteRead]] chunked
  * serving) — a Prometheus client reading this server streams chunks it
  * can hand straight to its own chunk iterator.
  *
  * Encoding contract (mirrors xor.go exactly, so real Prometheus decodes
  * these bytes):
  *  - sample 0: timestamp as SIGNED varint (zigzag), value as 64 raw bits
  *  - sample 1: time delta as UNSIGNED varint, value XOR-coded
  *  - sample n: delta-of-delta prefix-coded — `0` (dod = 0),
  *    `10`+14 bits, `110`+17 bits, `1110`+20 bits, `1111`+64 bits
  *    (two's-complement truncation; range check is
  *    `-(2^(n-1)-1) <= dod <= 2^(n-1)`)
  *  - XOR value coding: control bit 0 = identical value; `10` = reuse the
  *    previous leading/trailing window; `11` = new window — 5 bits
  *    leading-zero count (capped at 31), 6 bits significant-bit count
  *    (64 stored as 0), then the significant bits.
  *
  * Timestamps must be non-decreasing (TSDB appends in time order —
  * callers sort; the second delta is unsigned by format). */
object XorChunk {

  private final class BitWriter {
    private val buf = mutable.ArrayBuffer.empty[Byte]
    private var bitPos = 0 // bits used in the current (last) byte

    def writeBit(b: Int): Unit = {
      if (bitPos == 0) buf += 0
      if (b != 0) {
        val i = buf.length - 1
        buf(i) = (buf(i) | (0x80 >> bitPos)).toByte
      }
      bitPos = (bitPos + 1) & 7
    }

    /** Low `n` bits of `v`, most significant first (xor.go writeBits). */
    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }

    def writeByte(b: Byte): Unit = writeBits(b & 0xffL, 8)

    def bytes: Array[Byte] = buf.toArray
  }

  private final class BitReader(b: Array[Byte], startBit: Long) {
    private var pos = startBit
    def readBit(): Int = {
      val byteIdx = (pos >> 3).toInt
      if (byteIdx >= b.length) sys.error("xor chunk truncated")
      val bit = (b(byteIdx) >> (7 - (pos & 7))) & 1
      pos += 1
      bit
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readByte(): Int = readBits(8).toInt
  }

  // varints over the bit stream (byte-aligned values inside an unaligned
  // stream — xor.go writes them through the same bit buffer)
  private def writeUvarint(w: BitWriter, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { w.writeByte(((v & 0x7f) | 0x80).toByte); v >>>= 7 }
    w.writeByte((v & 0x7f).toByte)
  }
  private def writeVarint(w: BitWriter, v: Long): Unit =
    writeUvarint(w, (v << 1) ^ (v >> 63)) // zigzag
  private def readUvarint(r: BitReader): Long = {
    var v = 0L; var shift = 0
    while (true) {
      if (shift > 63) sys.error("uvarint too long in xor chunk")
      val b = r.readByte()
      v |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) return v
      shift += 7
    }
    v
  }
  private def readVarint(r: BitReader): Long = {
    val u = readUvarint(r)
    (u >>> 1) ^ -(u & 1L)
  }

  private def bitRange(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  /** Encode time-sorted samples into one XOR chunk (max 65535 samples —
    * the 2-byte header; TSDB cuts chunks at 120, [[RemoteRead]] does the
    * same when serving). */
  def encode(samples: Seq[(Long, Double)]): Array[Byte] = {
    require(samples.length <= 0xffff,
      s"xor chunk holds at most 65535 samples, got ${samples.length}")
    val w = new BitWriter
    w.writeBits(samples.length.toLong, 16) // 2-byte BE count header
    var prevT = 0L
    var prevTDelta = 0L
    var prevV = 0.0
    var prevLeading = 0xff // sentinel: no window yet
    var prevTrailing = 0

    def writeVDelta(v: Double, prev: Double): Unit = {
      val xor = java.lang.Double.doubleToRawLongBits(v) ^
        java.lang.Double.doubleToRawLongBits(prev)
      if (xor == 0L) { w.writeBit(0); return }
      w.writeBit(1)
      var leading = java.lang.Long.numberOfLeadingZeros(xor)
      val trailing = java.lang.Long.numberOfTrailingZeros(xor)
      if (leading >= 32) leading = 31 // 5-bit field
      if (prevLeading != 0xff && leading >= prevLeading &&
          trailing >= prevTrailing) {
        w.writeBit(0)
        w.writeBits(xor >>> prevTrailing, 64 - prevLeading - prevTrailing)
      } else {
        prevLeading = leading
        prevTrailing = trailing
        w.writeBit(1)
        w.writeBits(leading.toLong, 5)
        val sigbits = 64 - leading - trailing
        w.writeBits(sigbits.toLong & 0x3f, 6) // 64 encodes as 0
        w.writeBits(xor >>> trailing, sigbits)
      }
    }

    samples.zipWithIndex.foreach { case ((t, v), i) =>
      if (i == 0) {
        writeVarint(w, t)
        w.writeBits(java.lang.Double.doubleToRawLongBits(v), 64)
      } else if (i == 1) {
        val tDelta = t - prevT
        require(tDelta >= 0, s"xor chunk timestamps must be sorted ($prevT -> $t)")
        writeUvarint(w, tDelta)
        prevTDelta = tDelta
        writeVDelta(v, prevV)
      } else {
        val tDelta = t - prevT
        require(tDelta >= 0, s"xor chunk timestamps must be sorted ($prevT -> $t)")
        val dod = tDelta - prevTDelta
        if (dod == 0) w.writeBit(0)
        else if (bitRange(dod, 14)) { w.writeBits(0x2, 2); w.writeBits(dod, 14) }
        else if (bitRange(dod, 17)) { w.writeBits(0x6, 3); w.writeBits(dod, 17) }
        else if (bitRange(dod, 20)) { w.writeBits(0xe, 4); w.writeBits(dod, 20) }
        else { w.writeBits(0xf, 4); w.writeBits(dod, 64) }
        prevTDelta = tDelta
        writeVDelta(v, prevV)
      }
      prevT = t
      prevV = v
    }
    w.bytes
  }

  /** Decode one XOR chunk back to (timestamp, value) samples. */
  def decode(bytes: Array[Byte]): Seq[(Long, Double)] = {
    if (bytes.length < 2) sys.error("xor chunk shorter than its header")
    val num = ((bytes(0) & 0xff) << 8) | (bytes(1) & 0xff)
    val r = new BitReader(bytes, 16L)
    val out = mutable.ArrayBuffer.empty[(Long, Double)]
    var t = 0L
    var tDelta = 0L
    var vBits = 0L
    var leading = 0
    var trailing = 0
    var i = 0
    while (i < num) {
      if (i == 0) {
        t = readVarint(r)
        vBits = r.readBits(64)
      } else {
        if (i == 1) tDelta = readUvarint(r)
        else {
          // delta-of-delta prefix: count leading 1 bits (max 4)
          var d = 0
          var bits = 0
          while (bits < 4 && r.readBit() == 1) { d += 1; bits += 1 }
          val sz = d match {
            case 0 => 0
            case 1 => 14
            case 2 => 17
            case 3 => 20
            case 4 => 64
          }
          if (sz > 0) {
            var dod = r.readBits(sz)
            if (sz != 64 && dod > (1L << (sz - 1))) dod -= (1L << sz) // sign
            tDelta += dod
          }
        }
        t += tDelta
        // XOR value
        if (r.readBit() == 1) {
          if (r.readBit() == 1) {
            leading = r.readBits(5).toInt
            var mbits = r.readBits(6).toInt
            if (mbits == 0) mbits = 64
            // a corrupt window (leading + mbits > 64) would make trailing
            // negative and the shift below wrap mod 64, XOR-ing garbage
            // in silently — fail loudly like the codec's other guards
            if (leading + mbits > 64)
              sys.error(s"xor chunk: window leading=$leading mbits=$mbits exceeds 64 bits")
            trailing = 64 - leading - mbits
          }
          val mbits = 64 - leading - trailing
          vBits ^= r.readBits(mbits) << trailing
        }
      }
      out += ((t, java.lang.Double.longBitsToDouble(vBits)))
      i += 1
    }
    out.toSeq
  }
}
