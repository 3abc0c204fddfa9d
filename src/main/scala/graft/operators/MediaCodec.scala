package graft.operators

/** Real pure-JVM media header codec behind the [[Multimodal.MediaDecoder]]
  * seam (round 10, closing the "decode is stub-only" gap): byte-level
  * parsers for the three classic self-describing formats a container
  * with no native image/audio libraries can still decode honestly —
  * BMP (BITMAPINFOHEADER), RIFF/WAVE (canonical PCM chunk layout), and
  * GIF (87a/89a logical screen descriptor). Magic bytes, endianness,
  * chunk walking, and truncation handling are the real thing; pixel /
  * sample DECODING is out of scope by design (features ride the
  * [[Multimodal.StubDecoder]] seam until a real codec is linked).
  *
  * Envelope lineage: the generalization of the reference's framed
  * deserializer (kafka-stream-service MessageDeserializer.java:49-70 —
  * magic byte, length-prefixed fields, loud rejection of malformed
  * frames), applied to public file formats instead of the riff wire.
  *
  * Every read is bounds-checked: malformed bytes produce a row with
  * `err` set (the quarantine column pattern — corrupt media must
  * surface per-row, never throw a task at 100 TB).
  */
object MediaCodec {

  /** Parsed header metadata. Numeric fields are 0 where the format has
    * no such notion (sample_rate for images) or when `err` is set;
    * `err` is "" on success. */
  final case class ParsedMedia(media_id: Long, format: String,
      n_bytes: Int, width: Int, height: Int, bit_depth: Int,
      sample_rate: Int, channels: Int, n_frames: Int, err: String)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def i32le(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)
  private def u16be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, java.nio.charset.StandardCharsets.US_ASCII)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def fail(id: Long, format: String, n: Int, err: String) =
    ParsedMedia(id, format, n, 0, 0, 0, 0, 0, 0, err)

  /** Parse a payload's header. Never throws on malformed input. */
  def parse(id: Long, payload: Array[Byte]): ParsedMedia = {
    val n = payload.length
    if (n >= 2 && payload(0) == 'B' && payload(1) == 'M') parseBmp(id, payload)
    else if (n >= 4 && ascii(payload, 0, 4) == "RIFF") parseWav(id, payload)
    else if (n >= 6 && (ascii(payload, 0, 6) == "GIF87a" ||
        ascii(payload, 0, 6) == "GIF89a")) parseGif(id, payload)
    else if (n >= 8 && payload.startsWith(PngSig)) parsePng(id, payload)
    else if (n >= 2 && u8(payload, 0) == 0xff && u8(payload, 1) == 0xd8)
      parseJpeg(id, payload)
    else fail(id, "unknown", n, "unknown_magic")
  }

  /** BMP with a BITMAPINFOHEADER (40-byte DIB, the near-universal
    * variant): width i32 LE at 18, height i32 LE at 22 — NEGATIVE
    * height means top-down row order and is reported as its magnitude —
    * bit depth u16 LE at 28. */
  private def parseBmp(id: Long, b: Array[Byte]): ParsedMedia = {
    val n = b.length
    if (n < 54) return fail(id, "bmp", n, "truncated")
    if (i32le(b, 14) < 40) return fail(id, "bmp", n, "bad_dib")
    val w = i32le(b, 18)
    val h = i32le(b, 22)
    // width must be positive (the spec allows only height to go
    // negative, meaning top-down rows); h = Int.MinValue would survive
    // math.abs negative — both quarantine (found by MediaCodecFuzzSpec)
    if (w <= 0 || h == 0 || h == Int.MinValue)
      return fail(id, "bmp", n, "bad_dims")
    ParsedMedia(id, "bmp", n, w, math.abs(h), u16le(b, 28),
      0, 0, 1, "")
  }

  /** RIFF/WAVE chunk walk: "WAVE" tag at 8, then (id, u32-LE size)
    * chunks from 12, word-aligned (odd sizes pad one byte). Reads the
    * "fmt " fields and the "data" chunk size; frame count =
    * dataSize / blockAlign. */
  private def parseWav(id: Long, b: Array[Byte]): ParsedMedia = {
    val n = b.length
    if (n < 12 || ascii(b, 8, 4) != "WAVE")
      return fail(id, "riff", n, "truncated")
    var off = 12
    var rate, ch, bits, blockAlign = 0
    var dataSize = -1
    var fmtSeen = false
    while (off + 8 <= n) {
      val cid = ascii(b, off, 4)
      val size = i32le(b, off + 4)
      if (size < 0 || off + 8 + size > n)
        return fail(id, "wav", n, "truncated")
      if (cid == "fmt ") {
        if (size < 16) return fail(id, "wav", n, "bad_fmt")
        ch = u16le(b, off + 10)
        rate = i32le(b, off + 12)
        blockAlign = u16le(b, off + 20)
        bits = u16le(b, off + 22)
        fmtSeen = true
      } else if (cid == "data") dataSize = size
      off += 8 + size + (size & 1)
    }
    if (!fmtSeen) return fail(id, "wav", n, "no_fmt")
    // the sample rate rides a SIGNED i32 — a corrupt fmt chunk can
    // carry a negative rate (found by MediaCodecFuzzSpec)
    if (rate <= 0) return fail(id, "wav", n, "bad_rate")
    val frames =
      if (blockAlign > 0 && dataSize >= 0) dataSize / blockAlign else 0
    ParsedMedia(id, "wav", n, 0, 0, bits, rate, ch, frames, "")
  }

  /** GIF logical screen descriptor: u16-LE width at 6, height at 8
    * (13-byte header incl. flags/background/aspect). */
  private def parseGif(id: Long, b: Array[Byte]): ParsedMedia = {
    val n = b.length
    if (n < 13) return fail(id, "gif", n, "truncated")
    ParsedMedia(id, "gif", n, u16le(b, 6), u16le(b, 8), 0, 0, 0, 1, "")
  }

  /** PNG (round 11 — the format a real image corpus actually contains):
    * 8-byte signature, then the IHDR chunk MUST come first (RFC 2083
    * §3.2): u32-BE length (= 13), "IHDR", width/height u32 BE, bit
    * depth u8, color type u8 — channels derive from the color type
    * (0 grey→1, 2 truecolor→3, 3 palette→1, 4 grey+α→2, 6 RGBA→4).
    * The chunk CRC is present but not validated (header parse, not
    * integrity check — same posture as the RIFF size field). */
  private def parsePng(id: Long, b: Array[Byte]): ParsedMedia = {
    val n = b.length
    if (n < 33) return fail(id, "png", n, "truncated")
    if (i32be(b, 8) != 13 || ascii(b, 12, 4) != "IHDR")
      return fail(id, "png", n, "bad_ihdr")
    val w = i32be(b, 16)
    val h = i32be(b, 20)
    if (w <= 0 || h <= 0) return fail(id, "png", n, "bad_dims")
    val channels = u8(b, 25) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return fail(id, "png", n, "bad_color_type")
    }
    ParsedMedia(id, "png", n, w, h, u8(b, 24), 0, channels, 1, "")
  }

  /** JPEG/JFIF marker walk (ITU T.81 §B): SOI, then (0xFF, marker,
    * u16-BE length incl. itself) segments — skipping 0xFF fill bytes
    * and length-less standalone markers (TEM, RSTn) — until a SOFn
    * frame header (C0–CF except DHT C4, JPG C8, DAC CC): precision u8,
    * height/width u16 BE, component count u8. Entropy data after SOS
    * is never scanned (SOF precedes SOS in every legal stream), so
    * parse cost is bounded by the header segments, not the payload. */
  private def parseJpeg(id: Long, b: Array[Byte]): ParsedMedia = {
    val n = b.length
    var off = 2
    while (off + 2 <= n) {
      if (u8(b, off) != 0xff) return fail(id, "jpeg", n, "bad_marker")
      var m = off + 1
      while (m < n && u8(b, m) == 0xff) m += 1 // fill bytes
      if (m >= n) return fail(id, "jpeg", n, "truncated")
      val marker = u8(b, m)
      if (marker == 0xd9 || marker == 0xda)
        return fail(id, "jpeg", n, "no_sof") // EOI / SOS before any SOF
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off = m + 1 // standalone marker, no length field
      } else {
        if (m + 3 > n) return fail(id, "jpeg", n, "truncated")
        val len = u16be(b, m + 1)
        if (len < 2 || m + 1 + len > n)
          return fail(id, "jpeg", n, "truncated")
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return fail(id, "jpeg", n, "bad_sof")
          return ParsedMedia(id, "jpeg", n, u16be(b, m + 6),
            u16be(b, m + 4), u8(b, m + 3), 0, u8(b, m + 8), 1, "")
        }
        off = m + 1 + len
      }
    }
    fail(id, "jpeg", n, "truncated")
  }

  // ---- writers (fixture builders + the encode half of the codec) ----

  private def putU16le(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putI32le(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
    b(i + 2) = ((v >> 16) & 0xff).toByte; b(i + 3) = ((v >> 24) & 0xff).toByte
  }

  /** 54-byte BMP header (no pixel data — header parse fixture). */
  def writeBmp(width: Int, height: Int, bpp: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    putI32le(b, 2, 54); putI32le(b, 10, 54); putI32le(b, 14, 40)
    putI32le(b, 18, width); putI32le(b, 22, height)
    putU16le(b, 26, 1); putU16le(b, 28, bpp)
    b
  }

  /** Canonical 44-byte PCM WAV header plus `nSamples` zeroed frames. */
  def writeWav(rate: Int, channels: Int, bits: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val dataSize = nSamples * blockAlign
    val b = new Array[Byte](44 + dataSize)
    "RIFF".getBytes.copyToArray(b, 0)
    putI32le(b, 4, 36 + dataSize)
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12)
    putI32le(b, 16, 16); putU16le(b, 20, 1)
    putU16le(b, 22, channels); putI32le(b, 24, rate)
    putI32le(b, 28, rate * blockAlign); putU16le(b, 32, blockAlign)
    putU16le(b, 34, bits)
    "data".getBytes.copyToArray(b, 36)
    putI32le(b, 40, dataSize)
    b
  }

  /** 13-byte GIF89a header (logical screen descriptor only). */
  def writeGif(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](13)
    "GIF89a".getBytes.copyToArray(b, 0)
    putU16le(b, 6, width); putU16le(b, 8, height)
    b
  }

  private def putU16be(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >> 8) & 0xff).toByte; b(i + 1) = (v & 0xff).toByte
  }
  private def putI32be(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  /** 33-byte PNG signature + IHDR chunk with a REAL CRC32 over
    * type+payload (the parser doesn't validate it, but fixture bytes
    * should be a prefix any external tool accepts). */
  def writePng(width: Int, height: Int, bitDepth: Int,
      colorType: Int): Array[Byte] = {
    val b = new Array[Byte](33)
    PngSig.copyToArray(b, 0)
    putI32be(b, 8, 13)
    "IHDR".getBytes.copyToArray(b, 12)
    putI32be(b, 16, width); putI32be(b, 20, height)
    b(24) = bitDepth.toByte; b(25) = colorType.toByte
    // compression 0 / filter 0 / interlace 0 at 26..28
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 17) // type + 13-byte payload
    putI32be(b, 29, crc.getValue.toInt)
    b
  }

  /** 41-byte JPEG/JFIF header: SOI + APP0(JFIF 1.1, no thumbnail) +
    * SOF0 (baseline, 8-bit, 3 components 4:2:0-style ids) + EOI. */
  def writeJpeg(width: Int, height: Int): Array[Byte] = {
    val b = new Array[Byte](41)
    b(0) = 0xff.toByte; b(1) = 0xd8.toByte // SOI
    b(2) = 0xff.toByte; b(3) = 0xe0.toByte // APP0
    putU16be(b, 4, 16)
    "JFIF".getBytes.copyToArray(b, 6) // b(10) = 0 terminator
    b(11) = 1; b(12) = 1 // version 1.1
    b(13) = 0 // density units: none
    putU16be(b, 14, 1); putU16be(b, 16, 1) // aspect 1:1
    // b(18..19) = 0: no thumbnail
    b(20) = 0xff.toByte; b(21) = 0xc0.toByte // SOF0
    putU16be(b, 22, 17) // 2 + 6 + 3*3
    b(24) = 8 // precision
    putU16be(b, 25, height); putU16be(b, 27, width)
    b(29) = 3 // components
    var i = 0
    while (i < 3) { // (id, sampling 1x1, quant table)
      b(30 + 3 * i) = (i + 1).toByte
      b(31 + 3 * i) = 0x11.toByte
      b(32 + 3 * i) = (if (i == 0) 0 else 1).toByte
      i += 1
    }
    b(39) = 0xff.toByte; b(40) = 0xd9.toByte // EOI
    b
  }

  /** Deterministic planted fixture for the q_media_headers gate: the
    * payload is CONSTRUCTED from the id by fixed arithmetic, so the
    * DuckDB oracle can predict every parsed field without parsing —
    * any header-codec bug hash-mismatches. id % 17 == 0 plants a
    * truncated RIFF (the quarantine path); id % 5 picks among all FIVE
    * formats (round 11 adds png/jpeg — the two a real image corpus is
    * mostly made of). id % 3 == 0 BMPs store a NEGATIVE (top-down)
    * height, invisible to the oracle because the parser reports
    * magnitude; PNG color type alternates truecolor/RGBA by id parity
    * so the channel mapping sits on the gated path. */
  def syntheticPayload(id: Long): Array[Byte] =
    if (id % 17 == 0) "RIFF".getBytes.take(4)
    else if (id % 5 == 0) {
      val h = (id % 480 + 1).toInt
      writeBmp((id % 640 + 1).toInt, if (id % 3 == 0) -h else h, 24)
    } else if (id % 5 == 1)
      writeWav(8000 + (id % 8).toInt * 4000, (id % 2 + 1).toInt, 16,
        (id % 100 + 1).toInt)
    else if (id % 5 == 2)
      writeGif((id % 1000 + 1).toInt, (id % 800 + 1).toInt)
    else if (id % 5 == 3)
      writePng((id % 1024 + 1).toInt, (id % 768 + 1).toInt, 8,
        if (id % 2 == 0) 2 else 6)
    else writeJpeg((id % 2000 + 1).toInt, (id % 1500 + 1).toInt)

  /** The [[Multimodal.MediaDecoder]]-shaped entry: real header parse
    * for dimensions/rate, stub feature (no pixel decode linked). */
  object HeaderDecoder extends Multimodal.MediaDecoder {
    override def decode(m: Multimodal.MediaRow): Multimodal.DecodedMedia = {
      val p = parse(m.media_id, m.payload)
      Multimodal.DecodedMedia(m.media_id, m.modality, m.source,
        p.n_bytes, p.width, p.height, p.n_frames, Array.empty[Float])
    }
  }
}
