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
}
