package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Randomized robustness property for the header codecs (round 12,
  * the r11 verdict's #8): five formats of byte-offset arithmetic
  * (MediaCodec.parse*) now sit on the per-row quarantine contract —
  * malformed bytes must NEVER throw out of `parse`, they must come
  * back as a quarantine row (`err` set) or, when the damage misses
  * every header field the parser reads, as a clean parse with sane
  * dimensions. Pure JVM (no Spark session): the same code path the
  * q_media_headers UDF runs per row. */
class MediaCodecFuzzSpec extends AnyFunSuite {
  import MediaCodec._

  private val genIntact: Gen[Array[Byte]] = Gen.oneOf(
    for { w <- Gen.chooseNum(1, 4096); h <- Gen.chooseNum(-4096, 4096)
          if h != 0 } yield writeBmp(w, h, 24),
    for { r <- Gen.chooseNum(1, 192000); c <- Gen.chooseNum(1, 8)
          f <- Gen.chooseNum(0, 100000) } yield writeWav(r, c, 16, f),
    for { w <- Gen.chooseNum(1, 65535); h <- Gen.chooseNum(1, 65535) }
      yield writeGif(w, h),
    for { w <- Gen.chooseNum(1, 1 << 20); h <- Gen.chooseNum(1, 1 << 20)
          ct <- Gen.oneOf(2, 6) } yield writePng(w, h, 8, ct),
    for { w <- Gen.chooseNum(1, 65535); h <- Gen.chooseNum(1, 65535) }
      yield writeJpeg(w, h))

  private val genMutated: Gen[Array[Byte]] = for {
    base <- genIntact
    // truncate anywhere (including to zero), then flip 0–3 bytes
    cut <- Gen.chooseNum(0, base.length)
    nFlips <- Gen.chooseNum(0, 3)
    flips <- Gen.listOfN(nFlips, for {
      i <- Gen.chooseNum(0, math.max(0, cut - 1))
      v <- Gen.chooseNum(0, 255)
    } yield (i, v.toByte))
  } yield {
    val out = base.take(cut)
    flips.foreach { case (i, v) => if (out.nonEmpty) out(i % out.length) = v }
    out
  }

  private val genGarbage: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 64)
    bs <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield bs.toArray

  private def check(payload: Array[Byte], round: Int): Unit = {
    val r = try parse(round.toLong, payload) catch {
      case e: Throwable =>
        fail(s"round $round: parse THREW ${e.getClass.getSimpleName}: " +
          s"${e.getMessage} on ${payload.length} bytes " +
          payload.take(24).map(b => f"${b & 0xff}%02x").mkString(" "))
    }
    assert(r.media_id == round.toLong && r.n_bytes == payload.length)
    assert(r.err != null, s"round $round: null err (clean is \"\"): $r")
    if (r.err.isEmpty) {
      // a clean parse must carry sane header values — damage that
      // slips past the checks may alter dimensions, never break them
      assert(r.width >= 0 && r.height >= 0 && r.bit_depth >= 0 &&
        r.sample_rate >= 0 && r.channels >= 0 && r.n_frames >= 0,
        s"round $round: clean parse with negative field: $r")
    }
  }

  test("property: truncated/bit-flipped payloads never throw — they " +
      "quarantine or parse with sane fields") {
    var seed = Seed(12L)
    for (round <- 1 to 4000) {
      val payload = genMutated.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      check(payload, round)
    }
  }

  test("property: arbitrary garbage bytes never throw") {
    var seed = Seed(21L)
    for (round <- 1 to 2000) {
      val payload = genGarbage.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      check(payload, round)
    }
  }

  test("zero/one-byte and signature-prefix-only payloads quarantine") {
    for (p <- Seq(Array.empty[Byte], Array[Byte]('B'), Array[Byte]('B', 'M'),
        "RIFF".getBytes, "GIF89a".getBytes,
        Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10),
        Array[Byte](0xff.toByte, 0xd8.toByte))) {
      val r = parse(0L, p)
      assert(r.err != null && r.err.nonEmpty,
        s"${p.length}-byte prefix must quarantine: $r")
    }
  }
}
