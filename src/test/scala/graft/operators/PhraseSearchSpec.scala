package graft.operators

import graft.SparkSpec

/** Positional phrase-search semantics on closed-form fixtures: exact
  * adjacency, occurrence counting, overlapping and repeated-term
  * phrases, case/empty-token handling. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the quick brown dog"),
    (2L, "quick brown"),
    (3L, "brown quick"),            // reversed — no match
    (4L, "quick  brown"),           // double space: empty token dropped
    (5L, "Quick Brown"),            // case-folded
    (6L, "aa aa aa"),               // repeated-term phrase, overlapping
    (7L, "quick red brown")         // gap — no match
  ).toDF("doc_id", "text")

  private def search(phrase: String*) =
    TextSearch.phraseSearch(docs, "doc_id", "text", phrase)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("two-term phrase: adjacency only, all occurrences, 0-based pos") {
    val m = search("quick", "brown")
    assert(m === Map(
      1L -> ((2L, 1L)),  // positions 1 and 7
      2L -> ((1L, 0L)),
      4L -> ((1L, 0L)),  // empty token dropped → adjacent
      5L -> ((1L, 0L)))) // lowercased
  }

  test("three-term phrase") {
    val m = search("quick", "brown", "fox")
    assert(m === Map(1L -> ((1L, 1L))))
  }

  test("repeated-term phrase counts overlapping occurrences") {
    val m = search("aa", "aa")
    assert(m === Map(6L -> ((2L, 0L)))) // anchors 0 and 1
  }

  test("single-term phrase is plain term lookup with counts") {
    val m = search("brown")
    assert(m.keySet === Set(1L, 2L, 3L, 4L, 5L, 7L))
    assert(m(1L) === ((2L, 2L)))
  }

  test("uppercase query terms match case-insensitively (postings are " +
      "lowercased)") {
    val m = search("Quick", "BROWN")
    assert(m.keySet === Set(1L, 2L, 4L, 5L))
    assert(m(1L) === ((2L, 1L)))
  }

  test("empty phrase is rejected") {
    intercept[IllegalArgumentException] {
      TextSearch.phraseSearch(docs, "doc_id", "text", Nil)
    }
  }
}
