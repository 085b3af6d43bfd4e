package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The decode here is REAL, pure-JVM, no native deps:
  *  - header metadata (format/width/height) parses straight out of the
  *    payload bytes with codegen'd column expressions — `substring` + `hex`
  *    + `conv` — so a metadata scan over 100 TB of media stays inside
  *    whole-stage codegen with zero UDF cost;
  *  - pixel-level feature extraction decodes BMP payloads (offset table,
  *    row padding, bottom-up BGR rows) inside `mapPartitions` — the batch
  *    shape a heavier codec (JPEG via javacv etc.) would slot into.
  *
  * The synthetic generators below build VALID files (BMP 24bpp;
  * PNG truecolor through java.util.zip's Deflater) — they are the fixture
  * path for oracle-checked tests, standing in for a real media column.
  */
object Multimodal {

  /** Canonical multimodal schema: id + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  // ------------------------------------------------------------------
  // Real header decode as column expressions (codegen'd, UDF-free)
  // ------------------------------------------------------------------

  /** Unsigned byte at 1-based `pos` of a binary column, as INT. */
  private def byteAt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 1)), 16, 10).cast("int")

  /** Signed int32 from four unsigned bytes: accumulate in LONG (a high
    * byte >= 0x80 would overflow INT arithmetic — ANSI mode, on by default
    * in Spark 4, THROWS instead of wrapping; top-down BMPs encode height
    * as a negative int32 so the high byte is routinely 0xFF), then wrap to
    * the signed range before the safe int cast. */
  private def signedInt32(b0: Column, b1: Column, b2: Column, b3: Column): Column = {
    val lv = b0.cast("long") + b1.cast("long") * 256L +
      b2.cast("long") * 65536L + b3.cast("long") * 16777216L
    when(lv >= 2147483648L, lv - 4294967296L).otherwise(lv).cast("int")
  }

  /** Little-endian int32 at 1-based `pos` (BMP headers). */
  private def leInt(bin: Column, pos: Int): Column =
    signedInt32(byteAt(bin, pos), byteAt(bin, pos + 1),
      byteAt(bin, pos + 2), byteAt(bin, pos + 3))

  /** Big-endian int32 at 1-based `pos` (PNG IHDR). */
  private def beInt(bin: Column, pos: Int): Column =
    signedInt32(byteAt(bin, pos + 3), byteAt(bin, pos + 2),
      byteAt(bin, pos + 1), byteAt(bin, pos))

  def isBmp(bin: Column): Column =
    length(bin) >= 54 && hex(substring(bin, 1, 2)) === "424D" // "BM"

  def isPng(bin: Column): Column =
    length(bin) >= 33 && hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"

  /** GIF87a/GIF89a magic + logical-screen descriptor present: width and
    * height are LE uint16 at offsets 6/8 — a header-level decode, like the
    * AVI/WAV metadata expressions. */
  def isGif(bin: Column): Column =
    length(bin) >= 13 &&
      (hex(substring(bin, 1, 6)) === "474946383961" || // "GIF89a"
        hex(substring(bin, 1, 6)) === "474946383761")  // "GIF87a"

  def gifWidth(bin: Column): Column =
    when(isGif(bin), byteAt(bin, 7) + byteAt(bin, 8) * 256)

  def gifHeight(bin: Column): Column =
    when(isGif(bin), byteAt(bin, 9) + byteAt(bin, 10) * 256)

  /** WebP RIFF container, EXTENDED (VP8X) variant — the chunk every
    * metadata-bearing encoder writes first: canvas dimensions as 24-bit LE
    * minus-one fields at offsets 24/27. Simple lossy/lossless files
    * without a VP8X chunk read as unrecognized (their dimensions live
    * inside the codec bitstream, a pixel-level concern). */
  def isWebpX(bin: Column): Column =
    length(bin) >= 30 &&
      hex(substring(bin, 1, 4)) === "52494646" &&  // "RIFF"
      hex(substring(bin, 9, 4)) === "57454250" &&  // "WEBP"
      hex(substring(bin, 13, 4)) === "56503858"    // "VP8X"

  def webpWidth(bin: Column): Column =
    when(isWebpX(bin),
      byteAt(bin, 25) + byteAt(bin, 26) * 256 + byteAt(bin, 27) * 65536 + 1)

  def webpHeight(bin: Column): Column =
    when(isWebpX(bin),
      byteAt(bin, 28) + byteAt(bin, 29) * 256 + byteAt(bin, 30) * 65536 + 1)

  /** Container format sniffed from magic bytes; null when unknown. */
  def imageFormat(bin: Column): Column =
    when(isBmp(bin), lit("bmp")).when(isPng(bin), lit("png"))
      .when(isGif(bin), lit("gif")).when(isWebpX(bin), lit("webp"))

  /** Pixel width decoded from the header: BMP = LE int32 at offset 18,
    * PNG = BE int32 at IHDR offset 16, GIF = LE uint16 at offset 6,
    * WebP(VP8X) = 24-bit LE minus-one at offset 24. Null for unrecognized
    * payloads. */
  def imageWidth(bin: Column): Column =
    when(isBmp(bin), leInt(bin, 19)).when(isPng(bin), beInt(bin, 17))
      .when(isGif(bin), gifWidth(bin)).when(isWebpX(bin), webpWidth(bin))

  /** Pixel height: BMP = LE int32 at offset 22 (absolute value — negative
    * encodes top-down row order), PNG = BE int32 at IHDR offset 20, GIF =
    * LE uint16 at offset 8, WebP(VP8X) = 24-bit LE minus-one at offset 27.
    * A crafted Int.MinValue BMP height reads null (its abs has no int32
    * representation; ANSI abs would throw). */
  def imageHeight(bin: Column): Column = {
    val h = leInt(bin, 23)
    when(isBmp(bin), when(h === Int.MinValue, lit(null)).otherwise(abs(h)))
      .when(isPng(bin), beInt(bin, 21))
      .when(isGif(bin), gifHeight(bin)).when(isWebpX(bin), webpHeight(bin))
  }

  /** Wrap a raw binary column into the canonical (payload, meta) shape.
    * Width/height are decoded from the payload's own header bytes (null for
    * non-image payloads) — a metadata-only pass that never leaves codegen. */
  def toMedia(df: DataFrame, idCol: String, binCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(binCol).as("payload"),
      struct(
        // mime rides imageFormat's dispatch so every format the
        // width/height decode understands (BMP/PNG/GIF/WebP) gets a
        // consistent mime — the old two-format coalesce predated the
        // GIF/WebP decoders and left their mime as the caller fallback
        coalesce(
          when(imageFormat(col(binCol)).isNotNull,
            concat(lit("image/"), imageFormat(col(binCol)))),
          lit(mime)).as("mime"),
        length(col(binCol)).cast("long").as("n_bytes"),
        imageWidth(col(binCol)).as("width"),
        imageHeight(col(binCol)).as("height")
      ).as("meta"))

  // ------------------------------------------------------------------
  // Pixel-level decode (mapPartitions batch shape)
  // ------------------------------------------------------------------

  /** Feature extraction over media partitions — one iterator of rows per
    * partition, arbitrary per-batch decode inside (the `mapInPandas` batch
    * shape). BMP payloads are genuinely decoded: pixel-data offset and
    * dimensions from the header, 4-byte row padding skipped, bottom-up BGR
    * rows walked in pixel order. Features:
    * `[width, height, mean(all channels)/255, mean(blue channel)/255]`.
    * Non-BMP payloads fall back to raw-byte statistics with width=height=0
    * (a real deployment dispatches to a codec per container format here). */
  def extractFeatures(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("feature", ArrayType(DoubleType))))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id")) // bound partition memory: payloads are big
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          val payload = r.getAs[Array[Byte]]("payload")
          Row(id, payload.length.toLong, decodeFeatures(payload))
        }
      }(enc)
  }

  private def u(b: Byte): Int = b & 0xFF

  private def leIntAt(b: Array[Byte], off: Int): Int =
    u(b(off)) | (u(b(off + 1)) << 8) | (u(b(off + 2)) << 16) | (u(b(off + 3)) << 24)

  /** Decode one payload to its feature vector (see [[extractFeatures]]). */
  def decodeFeatures(payload: Array[Byte]): Array[Double] =
    if (payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M' && {
      // corrupt headers can claim absurd dims — a row must actually fit,
      // and the offset must be non-negative (a 0x80000000 offset field
      // would otherwise pass the long sum and index negatively below)
      val w0 = leIntAt(payload, 18)
      val b0 = (u(payload(28)) | (u(payload(29)) << 8)) / 8
      w0 > 0 && b0 > 0 && leIntAt(payload, 10) >= 0 &&
        leIntAt(payload, 10).toLong + ((b0.toLong * w0 + 3) / 4) * 4 <= payload.length
    }) {
      val dataOffset = leIntAt(payload, 10)
      val w = leIntAt(payload, 18)
      val hRaw = leIntAt(payload, 22)
      val h = math.abs(hRaw.toLong)
      val bpp = (u(payload(28)) | (u(payload(29)) << 8))
      val bytesPerPx = bpp / 8
      // LONG row arithmetic: an unvalidated height near 2^31 with int
      // row*rowSize would wrap negative and crash; rows past the payload
      // contribute nothing, so the walk stops at the first one instead
      // of spinning bounds-checked no-ops for billions of declared rows
      val rowSize = ((bytesPerPx.toLong * w + 3) / 4) * 4
      var sumAll = 0.0
      var sumC0 = 0.0
      var n = 0L
      var row = 0L
      var base = dataOffset.toLong
      while (row < h && base < payload.length) {
        var x = 0
        while (x < w * bytesPerPx.toLong && base + x < payload.length) {
          val v = u(payload((base + x).toInt))
          sumAll += v
          if (x % bytesPerPx == 0) sumC0 += v // channel 0 = blue in BGR
          n += 1
          x += 1
        }
        row += 1
        base += rowSize
      }
      val px = if (n == 0) 1.0 else n.toDouble
      Array(w.toDouble, h.toDouble, sumAll / px / 255.0,
        sumC0 / (px / bytesPerPx.toDouble) / 255.0)
    } else {
      // generic binary: raw byte statistics, no dimensions
      var sum = 0.0
      var i = 0
      while (i < payload.length) { sum += u(payload(i)); i += 1 }
      val n = math.max(payload.length, 1).toDouble
      Array(0.0, 0.0, sum / n / 255.0, sum / n / 255.0)
    }

  // ------------------------------------------------------------------
  // Synthetic generators (fixture path — deterministic, oracle-replayable)
  // ------------------------------------------------------------------

  /** Deterministic dimensions from an id: width ∈ {8,12,16,20} (multiples
    * of 4, so BMP rows carry no padding and the pixel stream is contiguous),
    * height ∈ [4,11]. An oracle recomputes these by formula. */
  def synthDims(id: Long): (Int, Int) =
    ((2 + (id % 4).toInt) * 4, 4 + (id % 8).toInt)

  /** Pixel byte k of the synthetic stream: `(id*31 + k*7) mod 256` — chosen
    * SQL-replayable so a non-binary oracle can recompute pixel statistics. */
  def synthByte(id: Long, k: Int): Int = (((id * 31 + k * 7) % 256) + 256).toInt % 256

  /** A valid 24bpp BMP (54-byte BITMAPINFOHEADER) with the synthetic pixel
    * stream in file order; `delta` uniformly brightens every pixel byte
    * (mod 256) — the near-dup fixture knob. */
  def syntheticBmp(id: Long, delta: Int = 0): Array[Byte] = {
    val (w, h) = synthDims(id)
    val n = 3 * w * h
    val buf = java.nio.ByteBuffer.allocate(54 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + n).putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    buf.putInt(0).putInt(n).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var k = 0
    while (k < n) { buf.put(((synthByte(id, k) + delta) % 256).toByte); k += 1 }
    buf.array()
  }

  /** A valid truecolor PNG (signature + IHDR + one IDAT of deflated
    * filter-0 scanlines + IEND) via java.util.zip — pure JVM. */
  def syntheticPng(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    def chunk(tpe: String, data: Array[Byte]): Unit = {
      val b = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(b)
      val body = tpe.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32
      crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte) // 8-bit truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    // scanlines: filter byte 0 + RGB triplets of the synthetic stream
    val raw = new Array[Byte]((1 + 3 * w) * h)
    var k = 0
    var row = 0
    while (row < h) {
      val base = row * (1 + 3 * w)
      raw(base) = 0
      var x = 0
      while (x < 3 * w) { raw(base + 1 + x) = synthByte(id, k).toByte; k += 1; x += 1 }
      row += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val comp = new Array[Byte](raw.length + 64)
    val m = d.deflate(comp)
    d.end()
    chunk("IDAT", comp.take(m))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Audio: WAV (RIFF/PCM) — header decode + real sample decode
  // ------------------------------------------------------------------

  def isWav(bin: Column): Column =
    length(bin) >= 44 && hex(substring(bin, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(bin, 9, 4)) === "57415645"                       // "WAVE"

  /** Canonical-layout WAV header fields as column expressions (fmt chunk at
    * offset 12, the layout every standard PCM writer emits — [[decodeAudio]]
    * below walks chunks generally). */
  def wavChannels(bin: Column): Column =
    when(isWav(bin), byteAt(bin, 23) + byteAt(bin, 24) * 256)
  def wavSampleRate(bin: Column): Column =
    when(isWav(bin), leInt(bin, 25))
  def wavBitsPerSample(bin: Column): Column =
    when(isWav(bin), byteAt(bin, 35) + byteAt(bin, 36) * 256)

  /** Decoded audio facts from a WAV payload: a real RIFF chunk walk (not
    * fixed offsets) to the fmt + data chunks, then 16-bit LE PCM decode for
    * RMS amplitude. Returns (channels, sampleRate, frames, rms in [0,1]);
    * all zeros for non-WAV payloads. */
  def decodeAudio(payload: Array[Byte]): (Int, Int, Long, Double) = {
    if (payload.length < 44 || payload(0) != 'R' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'W' ||
        payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
      return (0, 0, 0L, 0.0)
    var channels = 0
    var rate = 0
    var bits = 0
    var rms = 0.0
    var frames = 0L
    // LONG cursor: a declared size near 2^31 must walk PAST the payload
    // end and stop, not wrap the int cursor negative and crash the
    // bounds check ("torn/adversarial size field" is this walk's contract)
    var off = 12L
    while (off + 8 <= payload.length) {
      val cid = new String(payload, off.toInt, 4, "US-ASCII")
      val size = leIntAt(payload, off.toInt + 4)
      if (size < 0) return (channels, rate, frames, rms) // torn/adversarial
      val body = off.toInt + 8
      cid match {
        case "fmt " if body + 16 <= payload.length =>
          channels = u(payload(body + 2)) | (u(payload(body + 3)) << 8)
          rate = leIntAt(payload, body + 4)
          bits = u(payload(body + 14)) | (u(payload(body + 15)) << 8)
        case "data" if bits == 16 && channels > 0 =>
          val n = math.min(size, payload.length - body) / 2
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val s = ((u(payload(body + 2 * i)) |
              (u(payload(body + 2 * i + 1)) << 8)).toShort).toInt
            sumSq += s.toDouble * s.toDouble
            i += 1
          }
          frames = n.toLong / channels
          if (n > 0) rms = math.sqrt(sumSq / n) / 32768.0
        case _ => ()
      }
      off = body.toLong + size + (size & 1) // RIFF chunks pad to even
    }
    (channels, rate, frames, rms)
  }

  /** A valid canonical PCM WAV: channels = 1 + id%2, sampleRate from a
    * 4-value table, 16-bit, frames = 50 + id%50; sample k (interleaved
    * order) = ((id*131 + k*17) mod 65536) - 32768 — SQL-replayable. */
  val wavRates: Array[Int] = Array(8000, 16000, 22050, 44100)

  def syntheticWav(id: Long): Array[Byte] = {
    val channels = 1 + (id % 2).toInt
    val rate = wavRates((id % 4).toInt)
    val frames = 50 + (id % 50).toInt
    val n = frames * channels // 16-bit samples
    val dataSize = 2 * n
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var k = 0
    while (k < n) {
      buf.putShort(((((id * 131 + k * 17) % 65536) + 65536) % 65536 - 32768).toShort)
      k += 1
    }
    buf.array()
  }

  // ------------------------------------------------------------------
  // Video: AVI (RIFF) — header decode; frame payloads stay opaque (a real
  // deployment hands them to an external codec; headers carry the
  // pipeline-relevant facts: dimensions, frame count, fps)
  // ------------------------------------------------------------------

  def isAvi(bin: Column): Column =
    length(bin) >= 72 && hex(substring(bin, 1, 4)) === "52494646" && // "RIFF"
      hex(substring(bin, 9, 4)) === "41564920"                       // "AVI "

  /** avih fields at the canonical layout (LIST hdrl at 12, avih at 24,
    * fields from 32): all standard writers emit this shape. */
  def aviMicroSecPerFrame(bin: Column): Column = when(isAvi(bin), leInt(bin, 33))
  def aviTotalFrames(bin: Column): Column = when(isAvi(bin), leInt(bin, 49))
  def aviWidth(bin: Column): Column = when(isAvi(bin), leInt(bin, 65))
  def aviHeight(bin: Column): Column = when(isAvi(bin), leInt(bin, 69))

  /** General RIFF walk to the avih header (not fixed offsets):
    * (width, height, totalFrames, fps). Zeros for non-AVI payloads. */
  def decodeVideoMeta(payload: Array[Byte]): (Int, Int, Long, Double) = {
    if (payload.length < 24 || payload(0) != 'R' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'A' ||
        payload(9) != 'V' || payload(10) != 'I' || payload(11) != ' ')
      return (0, 0, 0L, 0.0)
    // LONG cursors — see decodeAudio: declared sizes near 2^31 must not
    // wrap the walk negative
    var off = 12L
    while (off + 8 <= payload.length) {
      val cid = new String(payload, off.toInt, 4, "US-ASCII")
      val size = leIntAt(payload, off.toInt + 4)
      if (size < 0) return (0, 0, 0L, 0.0) // torn/adversarial size field
      val body = off.toInt + 8
      if (cid == "LIST" && body + 4 <= payload.length &&
          new String(payload, body, 4, "US-ASCII") == "hdrl") {
        var in = body + 4L
        // the declared list size is untrusted: clamp to the real payload
        val end = math.min(body.toLong + size, payload.length.toLong)
        while (in + 8 <= end) {
          val sub = new String(payload, in.toInt, 4, "US-ASCII")
          val subSize = leIntAt(payload, in.toInt + 4)
          if (subSize < 0) return (0, 0, 0L, 0.0)
          if (sub == "avih" && in + 8 + 40 <= payload.length) {
            val base = in.toInt + 8
            val usPerFrame = leIntAt(payload, base)
            val frames = leIntAt(payload, base + 16).toLong
            val w = leIntAt(payload, base + 32)
            val h = leIntAt(payload, base + 36)
            val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
            return (w, h, frames, fps)
          }
          in += 8L + subSize + (subSize & 1)
        }
      }
      off = body.toLong + size + (size & 1)
    }
    (0, 0, 0L, 0.0)
  }

  /** Frame rates with exact microsecond periods (1e6 divisible). */
  val aviFps: Array[Int] = Array(10, 20, 25, 40)

  /** A structurally valid AVI: RIFF/AVI + LIST hdrl(avih) + empty LIST
    * movi. Frame data intentionally absent — video frame decode is an
    * external-codec concern; the header is what the pipeline reads. */
  def syntheticAvi(id: Long): Array[Byte] = {
    val fps = aviFps((id % 4).toInt)
    val frames = 30 + (id % 30).toInt
    val w = 16 * (2 + (id % 4).toInt)
    val h = 8 * (4 + (id % 8).toInt)
    val hdrlBody = 4 + 8 + 56           // "hdrl" + avih chunk
    val moviBody = 4                    // "movi"
    val total = 12 + (8 + hdrlBody) + (8 + moviBody)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlBody)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56)
    buf.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)   // usPerFrame..flags
    buf.putInt(frames).putInt(0).putInt(1).putInt(0)          // totalFrames..sugBuf
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)               // reserved[4]
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviBody)
      .put("movi".getBytes("US-ASCII"))
    buf.array()
  }

  // ------------------------------------------------------------------
  // JPEG: real marker-segment walk (the third image container)
  // ------------------------------------------------------------------

  /** A structurally valid baseline JPEG: SOI, APP0/JFIF, a DQT stub, SOF0
    * with the synthetic dims, a DHT stub, SOS + a few entropy bytes, EOI.
    * Scan data is deliberately fake — like [[syntheticAvi]], the HEADER is
    * what a metadata pipeline reads; pixel decode is an external-codec
    * concern for this container. Segment lengths vary with id (the DQT
    * stub pads by id%7) so a fixed-offset "parser" cannot pass the tests —
    * only a real marker walk finds SOF0. */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int, body: Array[Byte]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      out.write(body, 0, body.length)
    }
    out.write(0xFF); out.write(0xD8)                       // SOI
    m(0xE0, ("JFIF" + "\u0000").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 0, 0, 1, 0, 1, 0, 0))              // APP0/JFIF 1.2
    m(0xFE, new Array[Byte](5 + (id % 7).toInt))           // COM (varied len)
    m(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(1))     // DQT table 0
    m(0xC0, Array[Byte](8,                                 // SOF0: precision
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,         // height BE
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,         // width BE
      3, 1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0))              // 3 components, Q0
    def dht(cls: Int): Array[Byte] =                       // one 1-bit code
      Array[Byte]((cls << 4).toByte) ++
        Array.tabulate[Byte](16)(i => if (i == 0) 1 else 0) ++ Array[Byte](0)
    m(0xC4, dht(0))                                        // DC table 0
    m(0xC4, dht(1))                                        // AC table 0
    m(0xDA, Array[Byte](3, 1, 0, 2, 0, 3, 0, 0, 63, 0))    // SOS (tables 0)
    (0 until 16).foreach(k => out.write(synthByte(id, k) & 0x7F)) // entropy
    out.write(0xFF); out.write(0xD9)                       // EOI
    out.toByteArray
  }

  private val jpegUdf = udf((id: Long) => syntheticJpeg(id))

  /** Attach a synthetic JPEG payload per row (the mm11 fixture). */
  def withSyntheticJpegs(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", jpegUdf(col(idCol).cast("long")))

  /** REAL JPEG metadata decode: walk the marker segments from SOI until a
    * start-of-frame (SOF0/1/2 — baseline, extended sequential,
    * progressive) and read (width, height, components, progressive) out of
    * its payload. Offsets are NOT fixed: every segment's big-endian length
    * is parsed and skipped, standalone markers (RST, TEM) and padding FFs
    * are handled, and the walk stops at SOS (entropy data may contain any
    * byte). Returns (0, 0, 0, false) for non-JPEG / torn payloads. */
  def decodeJpegMeta(payload: Array[Byte]): (Int, Int, Int, Boolean) = {
    val none = (0, 0, 0, false)
    if (payload.length < 4 || u(payload(0)) != 0xFF || u(payload(1)) != 0xD8)
      return none
    var off = 2
    while (off + 4 <= payload.length) {
      if (u(payload(off)) != 0xFF) return none
      var marker = u(payload(off + 1))
      // padding: any number of FF fill bytes may precede a marker
      while (marker == 0xFF && off + 2 < payload.length) {
        off += 1; marker = u(payload(off + 1))
      }
      if (marker == 0xD8 || marker == 0x01 ||
          (marker >= 0xD0 && marker <= 0xD7)) {
        off += 2 // standalone markers carry no length
      } else if (marker == 0xD9 || marker == 0xDA) {
        return none // EOI / SOS before any SOF: no dims to report
      } else {
        // The FF-padding loop above may have advanced `off`; re-validate the
        // 4-byte bound before reading the segment length or a torn payload
        // ending in fill bytes (e.g. FF D8 FF FF FF E0) reads past the end.
        if (off + 4 > payload.length) return none
        val len = (u(payload(off + 2)) << 8) | u(payload(off + 3))
        if (len < 2 || off + 2 + len > payload.length) return none
        if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
          if (len < 8) return none
          val p = off + 4
          val h = (u(payload(p + 1)) << 8) | u(payload(p + 2))
          val w = (u(payload(p + 3)) << 8) | u(payload(p + 4))
          return (w, h, u(payload(p + 5)), marker == 0xC2)
        }
        off += 2 + len
      }
    }
    none
  }

  /** JPEG metadata pass: (media_id, w, h, components, progressive) per
    * payload — the [[extractFeatures]] batch shape over
    * [[decodeJpegMeta]]. */
  def jpegMeta(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("w", IntegerType),
      StructField("h", IntegerType),
      StructField("components", IntegerType),
      StructField("progressive", BooleanType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          val (w, h, c, prog) = decodeJpegMeta(r.getAs[Array[Byte]]("payload"))
          Row(id, w, h, c, prog)
        }
      }(enc)
  }

  /** Walk the AVI `movi` list and emit every `every`-th video frame chunk
    * (`00dc`/`00db`) as (frame_idx, data offset, size) — the frame-SAMPLE
    * pass of a video pipeline: downstream decode touches only the sampled
    * chunks' byte ranges instead of whole files (at 100 TB the ranges
    * become ranged GETs). Real RIFF parsing including odd-size pad bytes;
    * non-AVI or frame-less payloads emit nothing. */
  def sampleFrames(payload: Array[Byte], every: Int): Seq[(Int, Long, Int)] = {
    if (payload.length < 24 || payload(0) != 'R' || payload(1) != 'I' ||
        payload(2) != 'F' || payload(3) != 'F' || payload(8) != 'A' ||
        payload(9) != 'V' || payload(10) != 'I' || payload(11) != ' ')
      return Nil
    val out = Seq.newBuilder[(Int, Long, Int)]
    // LONG cursors — see decodeAudio: declared sizes near 2^31 must not
    // wrap the walk negative
    var off = 12L
    while (off + 8 <= payload.length) {
      val cid = new String(payload, off.toInt, 4, "US-ASCII")
      val size = leIntAt(payload, off.toInt + 4)
      if (size < 0) return out.result() // torn/adversarial size field
      val body = off.toInt + 8
      if (cid == "LIST" && body + 4 <= payload.length &&
          new String(payload, body, 4, "US-ASCII") == "movi") {
        var in = body + 4L
        var idx = 0
        // the declared list size is untrusted: clamp to the real payload
        val end = math.min(body.toLong + size, payload.length.toLong)
        while (in + 8 <= end) {
          val sub = new String(payload, in.toInt, 4, "US-ASCII")
          val subSize = leIntAt(payload, in.toInt + 4)
          if (subSize < 0) return out.result()
          if (sub == "00dc" || sub == "00db") {
            if (idx % every == 0) out += ((idx, in + 8, subSize))
            idx += 1
          }
          in += 8L + subSize + (subSize & 1) // odd chunks pad one byte
        }
      }
      off = body.toLong + size + (size & 1)
    }
    out.result()
  }

  /** Frame sampling over a media frame: one output row per sampled frame
    * chunk — same mapPartitions batch shape as [[extractFeatures]]. */
  def sampleVideoFrames(media: DataFrame, every: Int,
      targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("offset", LongType),
      StructField("n_bytes", IntegerType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          sampleFrames(r.getAs[Array[Byte]]("payload"), every)
            .map { case (i, o, n) => Row(id, i, o, n) }
        }
      }(enc)
  }

  /** Nearest-neighbor 2× downsample of a 24bpp BMP: output pixel (j, i)
    * samples input FILE-ROW 2j, column 2i (floor dims — the resize step of
    * an image pipeline, real pixel indexing over the decoded stream).
    * Returns (halfWidth, halfHeight, mean of sampled bytes / 255);
    * (0, 0, 0) for non-BMP payloads. */
  def resizeBmp(payload: Array[Byte]): (Int, Int, Double) = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M')
      return (0, 0, 0.0)
    val dataOffset = leIntAt(payload, 10)
    val w = leIntAt(payload, 18)
    val h = math.abs(leIntAt(payload, 22).toLong)
    val bytesPerPx = (u(payload(28)) | (u(payload(29)) << 8)) / 8
    // LONG arithmetic throughout: a crafted bpp*w can overflow an int
    // rowSize negative (passing the fit guard), and a 0x80000000 offset
    // or huge height would index negatively / spin billions of no-ops
    val rowSize = ((bytesPerPx.toLong * w + 3) / 4) * 4
    // corrupt headers can claim absurd dims: a row must actually fit, or
    // the bounds-guarded loops would spin over millions of no-op indexes
    if (w <= 0 || h <= 0 || bytesPerPx <= 0 || dataOffset < 0 ||
        dataOffset.toLong + rowSize > payload.length) return (0, 0, 0.0)
    val (w2, h2) = (w / 2, (h / 2).min(Int.MaxValue.toLong).toInt)
    var sum = 0.0
    var cnt = 0L
    var ry = 0
    var rowBase = dataOffset.toLong
    while (ry < h2 && rowBase < payload.length) {
      var rx = 0
      while (rx < w2) {
        var c = 0
        while (c < bytesPerPx) {
          val p = rowBase + 2L * rx * bytesPerPx + c
          if (p < payload.length) { sum += u(payload(p.toInt)); cnt += 1 }
          c += 1
        }
        rx += 1
      }
      ry += 1
      rowBase += 2L * rowSize
    }
    ((w / 2), h2, if (cnt == 0) 0.0 else sum / cnt / 255.0)
  }

  /** 64-bit difference hash (dHash) — the standard perceptual image
    * fingerprint: sample the decoded pixel stream on a 9×8 grid (nearest
    * neighbor over FILE rows, like [[resizeBmp]]), reduce each sample to a
    * luma sum (the channel-byte total — comparison-equivalent to the mean,
    * with no division to disagree about), and set bit `r*8+c` iff
    * `luma(r,c) < luma(r,c+1)`. Robust to uniform brightness shifts: a
    * +δ (mod 256) shift flips only the comparisons whose sampled bytes
    * wrap, so shifted copies land a small hamming distance apart — the
    * property the near-dup pair join exploits. Null for non-BMP payloads. */
  def dHashBmp(payload: Array[Byte]): java.lang.Long = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return null
    val dataOffset = leIntAt(payload, 10)
    val w = leIntAt(payload, 18)
    val h = math.abs(leIntAt(payload, 22).toLong)
    val bytesPerPx = (u(payload(28)) | (u(payload(29)) << 8)) / 8
    // LONG arithmetic — see resizeBmp: crafted headers must degrade to
    // the documented null/zero-contribution, never a negative index
    val rowSize = ((bytesPerPx.toLong * w + 3) / 4) * 4
    if (w <= 0 || h <= 0 || bytesPerPx <= 0 || dataOffset < 0 ||
        dataOffset.toLong + rowSize > payload.length) return null
    def luma(fy: Long, fx: Long): Int = {
      val p = dataOffset + fy * rowSize + fx * bytesPerPx
      var s = 0
      var c = 0
      while (c < bytesPerPx) {
        if (p + c < payload.length) s += u(payload((p + c).toInt))
        c += 1
      }
      s
    }
    var hash = 0L
    var r = 0
    while (r < 8) {
      val fy = r * h / 8
      var c = 0
      while (c < 8) {
        if (luma(fy, c.toLong * w / 9) < luma(fy, (c + 1).toLong * w / 9))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** dHash pass over a media frame: (media_id, dhash) per image — the
    * [[extractFeatures]] batch shape over [[dHashBmp]]. The signature
    * column feeds [[graft.pipeline.Dedup.hammingPairs64]] for banded-LSH
    * image near-dup pairs. */
  def dHashImages(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          Row(id, dHashBmp(r.getAs[Array[Byte]]("payload")))
        }
      }(enc)
  }

  /** Resize pass over a media frame: (media_id, rw, rh, mean) per image —
    * the [[extractFeatures]] batch shape over [[resizeBmp]]. */
  def resizeImages(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("rw", IntegerType),
      StructField("rh", IntegerType),
      StructField("mean", DoubleType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          val (rw, rh, m) = resizeBmp(r.getAs[Array[Byte]]("payload"))
          Row(id, rw, rh, m)
        }
      }(enc)
  }

  /** [[syntheticAvi]] variant whose `movi` list carries real frame chunks:
    * frame i is a `00dc` chunk of `8 + ((id + 3i) mod 12)` bytes (odd sizes
    * exercise RIFF pad handling) — layout fully formula-derivable, so an
    * oracle recomputes every sampled (offset, size) without parsing. */
  def syntheticAviFrames(id: Long): Array[Byte] = {
    val fps = aviFps((id % 4).toInt)
    val frames = 30 + (id % 30).toInt
    val w = 16 * (2 + (id % 4).toInt)
    val h = 8 * (4 + (id % 8).toInt)
    def frameSize(i: Int): Int = 8 + (((id + 3L * i) % 12).toInt + 12) % 12
    val hdrlBody = 4 + 8 + 56
    val moviBody = 4 + (0 until frames)
      .map(i => 8 + frameSize(i) + (frameSize(i) & 1)).sum
    val total = 12 + (8 + hdrlBody) + (8 + moviBody)
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("AVI ".getBytes("US-ASCII"))
    buf.put("LIST".getBytes("US-ASCII")).putInt(hdrlBody)
      .put("hdrl".getBytes("US-ASCII"))
    buf.put("avih".getBytes("US-ASCII")).putInt(56)
    buf.putInt(1000000 / fps).putInt(0).putInt(0).putInt(0)
    buf.putInt(frames).putInt(0).putInt(1).putInt(0)
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put("LIST".getBytes("US-ASCII")).putInt(moviBody)
      .put("movi".getBytes("US-ASCII"))
    (0 until frames).foreach { i =>
      val n = frameSize(i)
      buf.put("00dc".getBytes("US-ASCII")).putInt(n)
      var k = 0
      while (k < n + (n & 1)) { buf.put(synthByte(id, k).toByte); k += 1 }
    }
    buf.array()
  }

  private val aviFramesUdf = udf((id: Long) => syntheticAviFrames(id))

  /** Attach a frame-bearing synthetic AVI per row (frame-sample fixture). */
  def withSyntheticVideoFrames(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", aviFramesUdf(col(idCol).cast("long")))

  private val bmpUdf = udf((id: Long) => syntheticBmp(id))
  private val bmpNearDupUdf = udf((id: Long) =>
    syntheticBmp(id / 2, ((id % 2) * 4).toInt))

  /** Near-dup image fixture: docs 2k and 2k+1 render the SAME base image,
    * the odd one uniformly brightened by +4 (mod 256) — so each pair's
    * dHashes differ only where a sampled luma byte wraps. */
  def withSyntheticNearDupImages(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", bmpNearDupUdf(col(idCol).cast("long")))
  private val pngUdf = udf((id: Long) => syntheticPng(id))
  private val wavUdf = udf((id: Long) => syntheticWav(id))
  private val aviUdf = udf((id: Long) => syntheticAvi(id))

  /** Attach a synthetic AVI payload per row (video fixture). */
  def withSyntheticVideo(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", aviUdf(col(idCol).cast("long")))

  /** Attach a synthetic WAV payload per row (audio fixture). */
  def withSyntheticAudio(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("payload", wavUdf(col(idCol).cast("long")))

  /** Audio feature extraction: same mapPartitions batch shape as
    * [[extractFeatures]], over [[decodeAudio]]. Output one row per media:
    * (media_id, channels, sample_rate, frames, rms). */
  def extractAudioFeatures(media: DataFrame, targetPartitions: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("frames", LongType),
      StructField("rms", DoubleType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    media
      .repartition(targetPartitions, col("media_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("media_id"))
          val (c, sr, f, rms) = decodeAudio(r.getAs[Array[Byte]]("payload"))
          Row(id, c, sr, f, rms)
        }
      }(enc)
  }

  /** Attach a synthetic image payload per row: all BMP, or (mixed=true)
    * BMP for even ids / PNG for odd — the two-container fixture. */
  def withSyntheticImages(df: DataFrame, idCol: String,
      mixed: Boolean = false): DataFrame = {
    val id = col(idCol).cast("long")
    val payload =
      if (mixed) when(id % 2 === 0, bmpUdf(id)).otherwise(pngUdf(id))
      else bmpUdf(id)
    df.withColumn("payload", payload)
  }

  /** Minimal valid GIF89a: header + logical-screen descriptor carrying the
    * synthetic dimensions (no color table, trailer only) — header-decode
    * fixture, dimensions SQL-replayable via [[synthDims]]. */
  def syntheticGif(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val buf = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GIF89a".getBytes("US-ASCII"))
    buf.putShort(w.toShort).putShort(h.toShort)
    buf.put(0.toByte).put(0.toByte).put(0.toByte) // no GCT, bg, aspect
    buf.put(0x3B.toByte)                          // trailer
    buf.array()
  }

  /** Minimal valid extended WebP: RIFF + "WEBP" + one VP8X chunk carrying
    * the synthetic canvas dimensions as 24-bit LE minus-one fields. */
  def syntheticWebp(id: Long): Array[Byte] = {
    val (w, h) = synthDims(id)
    val buf = java.nio.ByteBuffer.allocate(30)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(22) // 4 ("WEBP") + 8 + 10
    buf.put("WEBP".getBytes("US-ASCII"))
    buf.put("VP8X".getBytes("US-ASCII")).putInt(10)
    buf.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // flags+rsv
    def le24(v: Int): Unit = {
      buf.put((v & 0xFF).toByte).put(((v >> 8) & 0xFF).toByte)
        .put(((v >> 16) & 0xFF).toByte); ()
    }
    le24(w - 1); le24(h - 1)
    buf.array()
  }

  private val gifUdf = udf((id: Long) => syntheticGif(id))
  private val webpUdf = udf((id: Long) => syntheticWebp(id))

  /** GIF for even ids / extended WebP for odd — the header-decode fixture
    * for the two container formats beyond BMP/PNG. */
  def withSyntheticGifWebp(df: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    df.withColumn("payload",
      when(id % 2 === 0, gifUdf(id)).otherwise(webpUdf(id)))
  }
}
