package graft.serde

import java.nio.charset.StandardCharsets

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.RiffMessage

/** Serde parity suite (SURVEY §5.2 items 1–2), mirroring the reference's
  * only format spec: the round-trip test MessageSerializerTests.java:37-49,
  * plus hand-derived byte vectors so compatibility holds without running
  * the Java reference. */
class RiffWireSpec extends AnyFunSuite {

  private val fixture = RiffMessage(
    scala.collection.immutable.ListMap(
      "Accept" -> Seq("*/*"),
      "Content-Type" -> Seq("text/plain")),
    "World".getBytes(StandardCharsets.UTF_8))

  test("reference fixture round-trips (MessageSerializerTests parity)") {
    val decoded = RiffWire.decode(RiffWire.encode(fixture))
    assert(decoded === fixture)
  }

  test("byte-level wire vector matches hand-derived frame") {
    val out = new java.io.ByteArrayOutputStream()
    def put(bs: Array[Byte]): Unit = out.write(bs)
    out.write(0xff)
    out.write(2) // header count
    out.write(6) // "Accept".length
    put("Accept".getBytes(StandardCharsets.UTF_8))
    val json1 = "[\"*/*\"]".getBytes(StandardCharsets.UTF_8)
    put(java.nio.ByteBuffer.allocate(4).putInt(json1.length).array())
    put(json1)
    out.write(12) // "Content-Type".length
    put("Content-Type".getBytes(StandardCharsets.UTF_8))
    val json2 = "[\"text/plain\"]".getBytes(StandardCharsets.UTF_8)
    put(java.nio.ByteBuffer.allocate(4).putInt(json2.length).array())
    put(json2)
    put("World".getBytes(StandardCharsets.UTF_8))
    assert(java.util.Arrays.equals(RiffWire.encode(fixture), out.toByteArray))
  }

  test("decode asserts the 0xff marker like MessageDeserializer.java:52") {
    val bad = Array[Byte](0x00, 0x00)
    val e = intercept[IllegalArgumentException](RiffWire.decode(bad))
    assert(e.getMessage.contains("0xff"))
  }

  test("gson-compatible escaping: html-safe + control chars") {
    assert(JsonStrings.encodeArray(Seq("a<b>c&d=e'f")) ===
      "[\"a\\u003cb\\u003ec\\u0026d\\u003de\\u0027f\"]")
    assert(JsonStrings.encodeArray(Seq("x\ny\t\"z\\")) ===
      "[\"x\\ny\\t\\\"z\\\\\"]")
    assert(JsonStrings.decodeArray("[\"x\\ny\\t\\\"z\\\\\"]") ===
      Seq("x\ny\t\"z\\"))
  }

  test("property: decode(encode(m)) == m within 1-byte field bounds") {
    val headerName = for {
      n <- Gen.chooseNum(1, 20)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString
    val headerValue = Gen.listOfN(3, Gen.asciiPrintableStr.map(_.take(30)))
    val gen = for {
      nh <- Gen.chooseNum(0, 10)
      names <- Gen.listOfN(nh, headerName)
      values <- Gen.listOfN(nh, headerValue)
      payload <- Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))
    } yield RiffMessage(
      scala.collection.immutable.ListMap(names.distinct.zip(values): _*),
      payload.toArray)
    // scalatestplus bridge isn't in the offline cache; drive Gen directly
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      val m = gen.pureApply(Gen.Parameters.default, seed)
      assert(RiffWire.decode(RiffWire.encode(m)) === m)
      seed = seed.next
    }
  }

  test("wire-format caps rejected loudly (bug-for-bug 1-byte limits)") {
    val tooMany = RiffMessage(
      (1 to 128).map(i => s"h$i" -> Seq("v")).toMap, Array[Byte]())
    intercept[IllegalArgumentException](RiffWire.encode(tooMany))
    val longName = RiffMessage(Map(("x" * 128) -> Seq("v")), Array[Byte]())
    intercept[IllegalArgumentException](RiffWire.encode(longName))
  }
}
