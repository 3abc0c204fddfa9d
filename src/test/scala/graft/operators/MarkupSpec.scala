package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form oracles for HTML → text extraction. */
class MarkupSpec extends SparkSpec {

  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(Markup.stripHtml(col("t")))
      .collect()(0).getString(0)

  test("script and style blocks vanish WITH their content") {
    assert(clean("""a<script>var x = "<p>hi</p>";</script>b""") == "a b")
    assert(clean("a<style>p { color: red }</style>b") == "a b")
    assert(clean("a<SCRIPT SRC='x.js'>keep() { }</SCRIPT>b") == "a b",
      "case-insensitive, attribute-bearing blocks too")
  }

  test("comments and tags strip; body text survives") {
    assert(clean("<p>Hello <b>World</b></p><!-- hidden -->") == "Hello World")
    assert(clean("<div\nclass='x'>multi\nline</div>") == "multi line",
      "newlines inside tags and text both handled")
  }

  test("entities decode once, in single-pass-safe order") {
    assert(clean("fish &amp; chips") == "fish & chips")
    assert(clean("&lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "<tag> \"q\" 's'")
    assert(clean("&amp;lt;") == "&lt;",
      "escaped-escape must decode exactly once")
  }

  test("whitespace squeezes; unclosed tags are conservative") {
    assert(clean("  a   b\t\nc  ") == "a b c")
    // unclosed <script> (no terminator): content is NOT eaten — tags are
    // stripped but text kept (never silently drop body text)
    assert(clean("a<p>text with < loose bracket") == "a text with < loose bracket")
  }

  test("codeFences: counts, chars, language tags; unterminated fence " +
      "ignored") {
    import spark.implicits._
    val docs = Seq(
      (1L, "intro\n```python\nprint(1)\n```\nmid\n```\nplain\n```"),
      (2L, "no fences at all"),
      (3L, "broken ```python\nnever closed"))
      .toDF("doc_id", "text")
    val got = Markup.codeFences(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    // doc 1: bodies "print(1)\n" (9 chars) and "plain\n" (6)
    assert(got == Set((1L, 2L, 15L, "python,"), (2L, 0L, 0L, ""),
      (3L, 0L, 0L, "")), got)
  }
}
