package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-vector oracles for the real header codec: hand-built and
  * writer-built headers, endianness, chunk walking, padding, and every
  * malformed-input branch (the codec must quarantine per-row, never
  * throw). */
class MediaCodecSpec extends AnyFunSuite {
  import MediaCodec._

  test("BMP round-trip: writer bytes parse back to the same fields") {
    val p = parse(7L, writeBmp(640, 480, 24))
    assert(p == ParsedMedia(7L, "bmp", 54, 640, 480, 24, 0, 0, 1, ""))
  }

  test("BMP negative (top-down) height reports its magnitude") {
    val p = parse(1L, writeBmp(33, -21, 32))
    assert(p.height == 21 && p.width == 33 && p.bit_depth == 32)
    assert(p.err == "")
  }

  test("BMP little-endian multi-byte width (> 255)") {
    val b = writeBmp(0x01020304, 2, 24)
    // offset 18..21 must be 04 03 02 01
    assert((b(18) & 0xff, b(19) & 0xff, b(20) & 0xff, b(21) & 0xff) ==
      ((4, 3, 2, 1)))
    assert(parse(0L, b).width == 0x01020304)
  }

  test("truncated BMP quarantines") {
    val p = parse(2L, "BM123456".getBytes)
    assert(p.err == "truncated" && p.format == "bmp" && p.n_bytes == 8)
    assert(p.width == 0 && p.height == 0)
  }

  test("WAV round-trip incl. frame count from data/blockAlign") {
    val p = parse(3L, writeWav(44100, 2, 16, 10))
    assert(p == ParsedMedia(3L, "wav", 44 + 40, 0, 0, 16, 44100, 2, 10, ""))
  }

  test("WAV chunk walk skips unknown odd-sized chunks with pad byte") {
    // RIFF/WAVE + a 3-byte "junk" chunk (padded to 4) before fmt + data
    val fmtAndData = writeWav(8000, 1, 16, 2).drop(12) // fmt +data chunks
    val head = new Array[Byte](12 + 8 + 4)
    "RIFF".getBytes.copyToArray(head, 0)
    "WAVE".getBytes.copyToArray(head, 8)
    "junk".getBytes.copyToArray(head, 12)
    head(16) = 3 // odd size => 1 pad byte
    val bytes = head ++ fmtAndData
    // fix the RIFF size field (parser ignores it, but keep it honest)
    val p = parse(4L, bytes)
    assert(p.sample_rate == 8000 && p.channels == 1 && p.n_frames == 2)
    assert(p.err == "")
  }

  test("WAV without fmt chunk quarantines as no_fmt") {
    val b = new Array[Byte](20)
    "RIFF".getBytes.copyToArray(b, 0)
    "WAVE".getBytes.copyToArray(b, 8)
    "data".getBytes.copyToArray(b, 12)
    // size 0 data chunk
    assert(parse(5L, b).err == "no_fmt")
  }

  test("WAV chunk overrunning the buffer quarantines as truncated") {
    val b = writeWav(8000, 1, 16, 4).dropRight(3)
    assert(parse(6L, b).err == "truncated")
  }

  test("GIF round-trip and truncation") {
    val p = parse(8L, writeGif(1024, 768))
    assert(p == ParsedMedia(8L, "gif", 13, 1024, 768, 0, 0, 0, 1, ""))
    assert(parse(9L, "GIF89a".getBytes).err == "truncated")
  }

  test("unknown magic quarantines") {
    val p = parse(10L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(p.format == "unknown" && p.err == "unknown_magic")
  }

  test("empty payload quarantines") {
    assert(parse(11L, Array.empty[Byte]).err == "unknown_magic")
  }

  test("PNG round-trip: writer bytes parse back, incl. multi-byte " +
      "big-endian dims and the color-type -> channel map") {
    val p = parse(20L, writePng(70000, 300, 8, 2))
    assert(p == ParsedMedia(20L, "png", 33, 70000, 300, 8, 0, 3, 1, ""))
    assert(parse(0L, writePng(1, 1, 16, 0)).channels == 1)
    assert(parse(0L, writePng(1, 1, 8, 3)).channels == 1)
    assert(parse(0L, writePng(1, 1, 8, 4)).channels == 2)
    assert(parse(0L, writePng(1, 1, 8, 6)).channels == 4)
  }

  test("PNG malformed branches quarantine: truncated, bad IHDR, bad " +
      "dims, bad color type") {
    assert(parse(1L, writePng(4, 4, 8, 2).take(20)).err == "truncated")
    val notIhdr = writePng(4, 4, 8, 2)
    "XXXX".getBytes.copyToArray(notIhdr, 12)
    assert(parse(1L, notIhdr).err == "bad_ihdr")
    val badCt = writePng(4, 4, 8, 2); badCt(25) = 5
    assert(parse(1L, badCt).err == "bad_color_type")
    val zeroW = writePng(0, 4, 8, 2)
    assert(parse(1L, zeroW).err == "bad_dims")
  }

  test("JPEG round-trip: SOF0 found past APP0, big-endian dims, " +
      "3 components") {
    val p = parse(21L, writeJpeg(1920, 1080))
    assert(p == ParsedMedia(21L, "jpeg", 41, 1920, 1080, 8, 0, 3, 1, ""))
  }

  test("JPEG marker walk skips fill bytes and unknown segments") {
    val base = writeJpeg(640, 480)
    // splice an unknown COM segment (FF FE len=4 xx xx) + a fill byte
    // between APP0 and SOF0
    val pre = base.take(20)
    val com = Array(0xff, 0xfe, 0x00, 0x04, 0x41, 0x42, 0xff)
      .map(_.toByte) // trailing 0xff = fill byte before the next marker
    val spliced = pre ++ com ++ base.drop(21) // drop SOF0's own 0xff
    val p = parse(22L, spliced)
    assert(p.err == "" && p.width == 640 && p.height == 480 &&
      p.channels == 3, p.toString)
  }

  test("JPEG malformed branches: EOI before any SOF, truncated " +
      "segment, bad marker byte") {
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(parse(1L, noSof).err == "no_sof")
    assert(parse(1L, writeJpeg(10, 10).take(30)).err == "truncated")
    val bad = writeJpeg(10, 10); bad(2) = 0x00
    assert(parse(1L, bad).err == "bad_marker")
  }

  test("synthetic fixtures parse to the oracle's id arithmetic") {
    // mirror of the q_media_headers DuckDB CASE expressions
    (1L to 170L).foreach { id =>
      val p = parse(id, syntheticPayload(id))
      if (id % 17 == 0)
        assert(p == ParsedMedia(id, "riff", 4, 0, 0, 0, 0, 0, 0,
          "truncated"), s"id=$id")
      else if (id % 5 == 0)
        assert(p == ParsedMedia(id, "bmp", 54, (id % 640 + 1).toInt,
          (id % 480 + 1).toInt, 24, 0, 0, 1, ""), s"id=$id")
      else if (id % 5 == 1) {
        val samp = (id % 100 + 1).toInt
        val ch = (id % 2 + 1).toInt
        assert(p == ParsedMedia(id, "wav", 44 + samp * ch * 2, 0, 0, 16,
          8000 + (id % 8).toInt * 4000, ch, samp, ""), s"id=$id")
      } else if (id % 5 == 2)
        assert(p == ParsedMedia(id, "gif", 13, (id % 1000 + 1).toInt,
          (id % 800 + 1).toInt, 0, 0, 0, 1, ""), s"id=$id")
      else if (id % 5 == 3)
        assert(p == ParsedMedia(id, "png", 33, (id % 1024 + 1).toInt,
          (id % 768 + 1).toInt, 8, 0, if (id % 2 == 0) 3 else 4, 1, ""),
          s"id=$id")
      else
        assert(p == ParsedMedia(id, "jpeg", 41, (id % 2000 + 1).toInt,
          (id % 1500 + 1).toInt, 8, 0, 3, 1, ""), s"id=$id")
    }
  }
}
