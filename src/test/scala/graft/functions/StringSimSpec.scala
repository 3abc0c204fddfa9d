package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Differential oracle for the Jaro–Winkler kernel: the expected
  * values below are DuckDB `jaro_winkler_similarity` outputs captured
  * verbatim (round-9 session probe) — the gate's oracle builtin. The
  * set covers the semantic corners: empty sides (DuckDB → 0, not 1),
  * the zero match window (`ab`/`ba`), transpositions (odd-mismatch
  * `abcd`/`bcad`), the 0.7 boost threshold from both sides, the
  * 4-char prefix cap, and case sensitivity. */
class StringSimSpec extends SparkSpec {
  import spark.implicits._

  private val duckdbReference = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("a", "", 0.0),
    ("", "", 0.0),
    ("ab", "ba", 0.0),
    ("dwayne", "duane", 0.8400000000000001),
    ("crate", "trace", 0.7333333333333334),
    ("arnab", "aranb", 0.9466666666666665),
    ("prefix", "prefixx", 0.9714285714285714),
    ("abcdef", "abdcef", 0.9555555555555556),
    ("aabbcc", "aaxxyy", 0.5555555555555555),
    ("ab", "abcdefghij", 0.7866666666666667),
    ("aaaa", "aabb", 0.6666666666666666),
    ("abcd", "bcad", 0.8333333333333334),
    ("information", "informant", 0.9414141414141414),
    ("a", "a", 1.0),
    ("ab", "aB", 0.6666666666666666))

  test("kernel matches the DuckDB builtin on the semantic corners") {
    duckdbReference.foreach { case (a, b, want) =>
      val got = StringSimExpressions.jaroWinklerOf(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(math.abs(got - want) < 1e-12,
        s"jw('$a','$b') = $got, duckdb says $want")
    }
  }

  test("symmetric, and the SQL surface + codegen path agree with " +
      "direct eval") {
    GraftFunctions.register(spark)
    val df = duckdbReference.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
    val viaSql = df.selectExpr("a", "b", "jaro_winkler(a, b) AS jw")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2)))
    viaSql.foreach { case (a, b, got) =>
      val direct = StringSimExpressions.jaroWinklerOf(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == direct, s"codegen vs eval mismatch on ('$a','$b')")
      val flipped = StringSimExpressions.jaroWinklerOf(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(flipped == direct, s"asymmetric on ('$a','$b')")
    }
  }

  test("null propagates") {
    GraftFunctions.register(spark)
    val r = Seq(("x", Option.empty[String])).toDF("a", "b")
      .selectExpr("jaro_winkler(a, b)").collect().head
    assert(r.isNullAt(0))
  }

  /** DuckDB `damerau_levenshtein` outputs probed this session — the
    * 'CA'→'ABC' = 2 row is the full-DL-vs-OSA discriminator (OSA says
    * 3), and 'résumé'→'resume' = 4 pins the BYTE-level alphabet. */
  private val duckdbDlReference = Seq(
    ("CA", "ABC", 2L), ("ab", "ba", 1L), ("abc", "acb", 1L),
    ("", "abc", 3L), ("", "", 0L), ("kitten", "sitting", 3L),
    ("ab", "b", 1L), ("aXbYc", "abc", 2L), ("abcd", "dcba", 3L),
    ("résumé", "resume", 4L), ("abab", "baba", 2L), ("ca", "abc", 2L),
    ("thee", "the", 1L), ("water", "wtaer", 1L))

  test("damerau_levenshtein matches the probed DuckDB outputs") {
    GraftFunctions.register(spark)
    duckdbDlReference.foreach { case (a, b, want) =>
      val got = DamerauLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"('$a','$b'): got $got want $want")
    }
    // through SQL/codegen too
    val got = duckdbDlReference.toDF("a", "b", "want")
      .selectExpr("damerau_levenshtein(a, b) AS got", "want")
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("damerau_levenshtein: random strings vs reference recursion") {
    // independent reference: memoized full-DL definition — min edits
    // where a transposition may swap any two adjacent-after-deletions
    // occurrences (Lowrance–Wagner semantics), byte alphabet
    def ref(a: String, b: String): Int = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val inf = x.length + y.length
      val w = y.length + 2
      val d = Array.fill((x.length + 2) * w)(0)
      d(0) = inf
      for (i <- 0 to x.length) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i }
      for (j <- 0 to y.length) { d(j + 1) = inf; d(w + j + 1) = j }
      val da = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
      for (i <- 1 to x.length) {
        var db = 0
        for (j <- 1 to y.length) {
          val k = da(y(j - 1) & 0xff); val l = db
          val cost = if ((x(i - 1) & 0xff) == (y(j - 1) & 0xff)) { db = j; 0 } else 1
          d((i + 1) * w + j + 1) = Seq(d(i * w + j) + cost,
            d((i + 1) * w + j) + 1, d(i * w + j + 1) + 1,
            d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)).min
        }
        da(x(i - 1) & 0xff) = i
      }
      d((x.length + 1) * w + y.length + 1)
    }
    // small alphabet maximizes transposition interactions; also check
    // symmetry and the triangle vs plain Levenshtein (DL <= Lev)
    val rnd = new scala.util.Random(11)
    def rs() = (0 until rnd.nextInt(9)).map(_ => "abАц".charAt(rnd.nextInt(4))).mkString
    (1 to 300).foreach { _ =>
      val (a, b) = (rs(), rs())
      val got = DamerauLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == ref(a, b), s"('$a','$b')")
      val rev = DamerauLevenshtein.distance(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(rev == got, s"asymmetric on ('$a','$b')")
    }
  }

  test("damerau_levenshtein: oversize input fails loudly") {
    val long = "x" * (DamerauLevenshtein.MaxLen + 1)
    val ex = intercept[Exception] {
      DamerauLevenshtein.distance(
        UTF8String.fromString(long), UTF8String.fromString("y"))
    }
    assert(ex.getMessage.contains("banded Levenshtein"))
  }
}
