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
}
