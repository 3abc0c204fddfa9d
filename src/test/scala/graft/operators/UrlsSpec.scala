package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form oracles for URL decomposition + normalization. */
class UrlsSpec extends SparkSpec {

  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("u").select(Urls.normalize(col("u")))
      .collect()(0).getString(0)

  test("host/path/query agree with Spark's parse_url on well-formed URLs") {
    val urls = Seq(
      "https://www.example.com/a/b?x=1&y=2#frag",
      "http://cdn.example.org:8080/assets/img.png",
      "https://user@api.example.net/v1?token=abc")
    val df = urls.toDF("u").select(
      Urls.host(col("u")).as("h"),
      Urls.path(col("u")).as("p"),
      Urls.query(col("u")).as("q"),
      lower(parse_url(col("u"), lit("HOST"))).as("ph"),
      parse_url(col("u"), lit("PATH")).as("pp"),
      parse_url(col("u"), lit("QUERY")).as("pq"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(3), s"host mismatch: $r")
      assert(r.getString(1) == r.getString(4), s"path mismatch: $r")
      // parse_url yields null for absent query; ours yields ""
      assert(r.getString(2) == Option(r.getString(5)).getOrElse(""),
        s"query mismatch: $r")
    }
  }

  test("normalization canonicalizes crawl variants to one key") {
    val variants = Seq(
      "HTTPS://WWW.Example.COM/Page?id=7",
      "https://www.example.com:443/Page?id=7#top",
      "https://www.example.com/Page?utm_source=x&id=7",
      "https://tracker@www.example.com/Page?id=7&utm_campaign=y")
    assert(variants.map(norm).toSet ==
      Set("https://www.example.com/Page?id=7"),
      variants.map(norm).toString)
  }

  test("normalization preserves what it must") {
    assert(norm("http://a.example.com:8080/x") ==
      "http://a.example.com:8080/x", "non-default port must survive")
    assert(norm("https://a.example.com:443x/y") ==
      "https://a.example.com:443x/y",
      "443x is a (weird) host suffix, not a default port")
    assert(norm("https://e.com/CaseSensitive/Path?A=b") ==
      "https://e.com/CaseSensitive/Path?A=b",
      "path and query case are server-significant")
    assert(norm("www.example.net/rel?utm_source=x&a=1#f") ==
      "www.example.net/rel?a=1",
      "scheme-less input still gets fragment/tracking cleanup")
  }

  test("normalization is idempotent; reg_domain takes last two labels") {
    val once = norm("HTTPS://U@www.Example.com:443/P?utm_x=1&a=2#f")
    assert(norm(once) == once)
    val rd = Seq("https://a.b.example.co/x").toDF("u")
      .select(Urls.registeredDomain(col("u"))).collect()(0).getString(0)
    assert(rd == "example.co")
  }
}
