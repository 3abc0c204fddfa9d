package graft.serde

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import graft.model.RiffMessage

/** The reference's length-prefixed wire format, reproduced byte-for-byte.
  *
  * Layout (reference `MessageSerializer.java:42-74` /
  * `MessageDeserializer.java:49-70`, SURVEY §1.3):
  *
  * {{{
  * byte 0      : 0xff start marker
  * byte 1      : header count (1 signed byte => <=127 headers)
  * per header  : 1-byte name length, name bytes,
  *               4-byte big-endian JSON length,
  *               JSON array of strings (Gson-compatible encoding)
  * rest        : payload bytes
  * }}}
  *
  * Bug-for-bug notes (SURVEY §7.4): header count and name length are single
  * *signed* bytes — more than 127 headers or a name longer than 127 bytes
  * silently corrupts in the reference, so we reject them loudly here while
  * keeping the on-wire encoding identical for legal inputs. The reference
  * serializes header values through Gson, whose default encoder is
  * "HTML-safe" (escapes `< > & = '` as < …); [[JsonStrings]] mirrors
  * that so byte vectors match the Java output exactly.
  */
object RiffWire {

  val Marker: Byte = 0xff.toByte

  def encode(m: RiffMessage): Array[Byte] = {
    require(m.headers.size <= 127,
      s"riff wire format caps headers at 127 (got ${m.headers.size})")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(Marker)
    out.writeByte(m.headers.size)
    // Encode in insertion/iteration order, like the reference (it walks
    // the protobuf map). Order is irrelevant to decode(encode(_)) parity.
    m.headers.foreach { case (name, values) =>
      val nameBytes = name.getBytes(StandardCharsets.UTF_8)
      require(nameBytes.length <= 127,
        s"riff wire format caps header-name length at 127 bytes (got ${nameBytes.length})")
      out.writeByte(nameBytes.length)
      out.write(nameBytes)
      val json = JsonStrings.encodeArray(values).getBytes(StandardCharsets.UTF_8)
      out.writeInt(json.length) // 4-byte big-endian, as DataOutputStream does
      out.write(json)
    }
    out.write(m.payload)
    out.flush()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): RiffMessage = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val marker = in.readByte()
    // The reference hard-asserts the marker (MessageDeserializer.java:52).
    if (marker != Marker)
      throw new IllegalArgumentException(
        f"riff frame must start with 0xff, got 0x$marker%02x")
    val headerCount = in.readByte()
    if (headerCount < 0)
      throw new IllegalArgumentException(
        s"riff frame header count byte out of range (>127): $headerCount")
    val headers = Seq.newBuilder[(String, Seq[String])]
    var i = 0
    while (i < headerCount) {
      val nameLen = in.readByte()
      if (nameLen < 0)
        throw new IllegalArgumentException(
          s"riff frame header-name length byte out of range (>127): $nameLen")
      val nameBytes = new Array[Byte](nameLen)
      in.readFully(nameBytes)
      val jsonLen = in.readInt()
      val jsonBytes = new Array[Byte](jsonLen)
      in.readFully(jsonBytes)
      val values = JsonStrings.decodeArray(new String(jsonBytes, StandardCharsets.UTF_8))
      headers += new String(nameBytes, StandardCharsets.UTF_8) -> values
      i += 1
    }
    val payload = in.readAllBytes()
    RiffMessage(headers.result().toMap, payload)
  }
}

/** Minimal JSON array-of-strings codec, byte-compatible with Gson's default
  * (HTML-safe) encoder as used by the reference serde. No JSON library is
  * available offline; the grammar here is exactly what the wire format needs.
  */
object JsonStrings {

  def encodeArray(values: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append('[')
    var first = true
    values.foreach { v =>
      if (!first) sb.append(',')
      first = false
      encodeString(v, sb)
    }
    sb.append(']')
    sb.toString
  }

  private def encodeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      // Gson default (htmlSafe=true) escapes these five as unicode:
      case c @ ('<' | '>' | '&' | '=' | '\'') => sb.append(f"\\u${c.toInt}%04x")
      case '\u2028' => sb.append("\\u2028")
      case '\u2029' => sb.append("\\u2029")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  def decodeArray(json: String): Seq[String] = {
    val p = new Parser(json)
    p.skipWs()
    val out = p.array()
    p.skipWs()
    require(p.eof, s"trailing garbage after JSON array: $json")
    out
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(i) == c, s"expected '$c' at $i in: $s")
      i += 1
    }
    def array(): Seq[String] = {
      expect('[')
      skipWs()
      val out = Seq.newBuilder[String]
      if (!eof && s.charAt(i) == ']') { i += 1; return out.result() }
      var done = false
      while (!done) {
        skipWs()
        out += string()
        skipWs()
        if (!eof && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      out.result()
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          require(!eof, "dangling escape")
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              require(i + 4 < s.length, "truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => throw new IllegalArgumentException(s"bad escape \\$other")
          }
          i += 1
        } else {
          sb.append(c)
          i += 1
        }
      }
      expect('"')
      sb.toString
    }
  }
}
