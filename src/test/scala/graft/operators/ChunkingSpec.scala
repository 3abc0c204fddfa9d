package graft.operators

import graft.SparkSpec

/** Closed-form oracles for overlapping window chunking. */
class ChunkingSpec extends SparkSpec {

  import spark.implicits._

  private def chunks(text: String, width: Int, stride: Int) =
    Chunking.slidingWindows(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        width, stride)
      .orderBy("chunk_id")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSeq

  test("overlapping windows with a ragged tail") {
    assert(chunks("a b c d e f g", width = 4, stride = 2) == Seq(
      (0, 0, 4, "a b c d"),
      (1, 2, 4, "c d e f"),
      (2, 4, 3, "e f g"),
      (3, 6, 1, "g")))
  }

  test("stride == width is exact non-overlapping segmentation") {
    assert(chunks("a b c d e", width = 2, stride = 2) == Seq(
      (0, 0, 2, "a b"), (1, 2, 2, "c d"), (2, 4, 1, "e")))
  }

  test("short and empty docs") {
    assert(chunks("a b", width = 8, stride = 4) == Seq((0, 0, 2, "a b")),
      "doc shorter than one window is one chunk")
    assert(chunks("", width = 8, stride = 4).isEmpty,
      "empty doc yields no chunks")
  }

  test("every token position is covered by at least one chunk") {
    val got = chunks(('a' to 'z').mkString(" "), width = 7, stride = 5)
    val covered = got.flatMap { case (_, s, n, _) => s until (s + n) }.toSet
    assert(covered == (0 until 26).toSet)
    // and with stride < width, interior boundaries overlap
    assert(got.flatMap { case (_, s, n, _) => s until (s + n) }
      .groupBy(identity).count(_._2.size > 1) > 0)
  }

  test("parameter contract is loud") {
    intercept[IllegalArgumentException] {
      Chunking.slidingWindows(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", width = 4, stride = 5)
    }
  }

  private def sentRows(text: String, maxTokens: Int) =
    Chunking.sentences(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", maxTokens)
      .orderBy("sent_id")
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toSeq

  test("sentences: greedy merge fills chunks without straddling") {
    // sentence token counts 3/2/2/1; max 5 → chunks {3+2}, {2+1}
    assert(sentRows("a b c. d e! f g? h", maxTokens = 5) == Seq(
      (1, 1, 3, "a b c."),
      (2, 1, 2, "d e!"),
      (3, 2, 2, "f g?"),
      (4, 2, 1, "h")))
  }

  test("sentences: an oversized sentence is its own chunk, never split") {
    assert(sentRows("a. b c d e f. g", maxTokens = 3) == Seq(
      (1, 1, 1, "a."),
      (2, 2, 5, "b c d e f."), // > max, alone in chunk 2
      (3, 3, 1, "g")))
  }

  test("sentences: terminator runs and no-terminator docs") {
    assert(sentRows("a b?! c d", maxTokens = 10) == Seq(
      (1, 1, 2, "a b?!"), (2, 1, 2, "c d")),
      "a ?! run is one boundary")
    assert(sentRows("a b c", maxTokens = 2) ==
      Seq((1, 1, 3, "a b c")),
      "no terminators: the whole doc is one (oversized) sentence")
  }

  test("sentences: assignment equals a reference greedy fold") {
    val text = (1 to 40).map(i => ("tok " * (i % 7 + 1)).trim + ".")
      .mkString(" ")
    val got = sentRows(text, maxTokens = 10)
    var acc = 0; var cid = 1
    val expect = got.map { case (_, _, n, _) =>
      if (acc > 0 && acc + n > 10) { cid += 1; acc = n } else acc += n
      cid
    }
    assert(got.map(_._2) == expect)
    assert(got.map(_._2).distinct.sorted == got.map(_._2).distinct,
      "chunk ids are nondecreasing and dense")
  }
}
