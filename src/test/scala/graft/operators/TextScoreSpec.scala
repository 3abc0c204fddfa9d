package graft.operators

import graft.SparkSpec

/** Hand-computed oracle for the unigram surprisal scorer. */
class TextScoreSpec extends SparkSpec {

  import spark.implicits._

  test("mean surprisal matches hand-computed smoothed unigram model") {
    // counts: a=2 b=2 c=1; T=5, V=3, alpha=0.5 → denom 6.5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextScore.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val pa = 2.5 / 6.5; val pc = 1.5 / 6.5
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, r6(-(2 * math.log(pa) + math.log(pa)) / 3))))
    assert(got(2L) == ((2L, r6(-(math.log(pa) + math.log(pc)) / 2))))
  }

  test("rare-token docs score strictly higher than common-token docs") {
    val docs = (Seq((1L, "x x x x x x x x"), (2L, "x x x x x x x rare")) ++
      (3L to 10L).map(i => (i, "x x"))).toDF("doc_id", "text")
    val got = TextScore.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L), "the rare token must raise doc 2's surprisal")
  }
}
