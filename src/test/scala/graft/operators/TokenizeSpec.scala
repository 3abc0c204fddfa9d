package graft.operators

import graft.SparkSpec

/** Hand-computed oracles for vocabulary build + id encoding. */
class TokenizeSpec extends SparkSpec {

  import spark.implicits._

  // counts: b=3, a=2, c=1 → ids b=0, a=1, c=2
  private val docs = Seq((1L, "a b b"), (2L, "b a c")).toDF("doc_id", "text")

  test("vocabulary ids follow (count desc, token asc)") {
    val v = Tokenize.vocabulary(docs, "text", 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("b" -> 0, "a" -> 1, "c" -> 2))
  }

  test("ties break lexicographically") {
    val v = Tokenize.vocabulary(Seq((1L, "z y z y")).toDF("doc_id", "text"),
        "text", 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(v == Map("y" -> 0, "z" -> 1))
  }

  test("encode preserves order and marks OOV with id = vocabSize") {
    val vocab = Tokenize.vocabulary(docs, "text", 2) // keeps b=0, a=1
    val got = Tokenize.encode(docs, "doc_id", "text", vocab, 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((3L, 0L, "1 0 0")))
    assert(got(2L) == ((3L, 1L, "0 1 2")), "c is OOV → id 2 at position 3")
  }
}
