package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form oracles for corpus-level line dedup: planted fixtures
  * where the removal set is known by construction. */
class LineDedupSpec extends SparkSpec {

  import spark.implicits._

  private def lined(rows: (Long, Seq[String])*) =
    rows.toDF("doc_id", "lines")

  private def result(rows: (Long, Seq[String])*) =
    LineDedup.removeDupLines(lined(rows: _*), "doc_id", "lines")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap

  test("duplicated line survives only in the smallest-id doc") {
    val out = result(
      1L -> Seq("unique one", "shared line"),
      2L -> Seq("shared line", "unique two"),
      3L -> Seq("unique three"))
    assert(out(1L) == (("unique one\nshared line", 2, 0)))
    assert(out(2L) == (("unique two", 2, 1)))
    assert(out(3L) == (("unique three", 1, 0)))
  }

  test("keeper doc keeps ALL its occurrences; losers lose all of theirs") {
    val out = result(
      1L -> Seq("b", "b", "a"),
      2L -> Seq("b", "c", "b"))
    assert(out(1L) == (("b\nb\na", 3, 0)), "keeper keeps within-doc repeats")
    assert(out(2L) == (("c", 3, 2)), "loser loses every occurrence")
  }

  test("within-doc repetition alone is not cross-doc duplication") {
    val out = result(
      1L -> Seq("same", "same", "same"),
      2L -> Seq("other"))
    assert(out(1L) == (("same\nsame\nsame", 3, 0)))
  }

  test("a doc losing every line emits empty text, not a dropped row") {
    val out = result(
      1L -> Seq("x", "y"),
      2L -> Seq("y", "x"))
    assert(out(1L) == (("x\ny", 2, 0)))
    assert(out(2L) == (("", 2, 2)))
  }

  test("minDocs raises the duplication threshold") {
    val df = lined(
      1L -> Seq("twice"), 2L -> Seq("twice"),
      3L -> Seq("thrice"), 4L -> Seq("thrice"), 5L -> Seq("thrice"))
    val out = LineDedup.removeDupLines(df, "doc_id", "lines", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(1L) == 0 && out(2L) == 0, "2-doc line below minDocs=3 stays")
    assert(out(3L) == 0 && out(4L) == 1 && out(5L) == 1,
      "3-doc line dedups, min-id doc keeps it")
  }

  test("boilerplate mode (keepFirst=false) removes the line everywhere") {
    val df = lined(1L -> Seq("menu", "body one"), 2L -> Seq("menu", "body two"))
    val out = LineDedup.removeDupLines(df, "doc_id", "lines",
        keepFirst = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "body one", 2L -> "body two"))
  }

  test("segmentByTokens: fixed windows, ragged tail, empty doc") {
    val df = Seq((1L, "A b c d e"), (2L, "x y"), (3L, ""))
      .toDF("doc_id", "text")
    val out = LineDedup.segmentByTokens(df, "text", "lines", width = 2)
      .select("doc_id", "lines")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b", "c d", "e"), "lowercased fixed windows")
    assert(out(2L) == Seq("x y"))
    assert(out(3L) == Seq.empty, "empty doc segments to no lines")
  }

  test("hash choice does not change the removal set") {
    val df = lined(
      1L -> Seq("dup", "keep1"), 2L -> Seq("dup", "keep2"),
      3L -> Seq("solo"))
    def dump(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      LineDedup.removeDupLines(df, "doc_id", "lines", hasher = h)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(dump(xxhash64(_)) == dump(md5(_)))
  }
}
