package graft.operators

import graft.SparkSpec

/** [[Retrieval.rrfFuse]]: hand-computed fusion scores, missing-doc
  * semantics, and the deterministic tie-break. */
class RrfFuseSpec extends SparkSpec {
  import spark.implicits._

  test("hand fusion: overlap wins, singles ranked by their one term") {
    val r1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc", "rank")
    val r2 = Seq((20L, 1L), (40L, 2L), (10L, 3L)).toDF("doc", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), "doc", "rank", kc = 60,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    def s(ranks: Long*) = BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20: 1/62+1/61 > 10: 1/61+1/63 > 40: 1/62 > 30: 1/63
    assert(got == Seq((20L, 2L, s(2, 1)), (10L, 2L, s(1, 3)),
      (40L, 1L, s(2)), (30L, 1L, s(3))), s"got $got")
  }

  test("a doc listed twice within ONE run raises instead of silently " +
      "inflating n_runs and the score sum") {
    val r1 = Seq((10L, 1L), (10L, 4L), (20L, 2L)).toDF("doc", "rank")
    val r2 = Seq((20L, 1L)).toDF("doc", "rank")
    val ex = intercept[Exception] {
      Retrieval.rrfFuse(Seq(r1, r2), "doc", "rank").collect()
    }
    assert(ex.getMessage.contains("more than once within a single run"),
      ex.getMessage)
    // the same doc across DIFFERENT runs stays legal (that IS fusion)
    val ok = Retrieval.rrfFuse(
      Seq(Seq((10L, 1L)).toDF("doc", "rank"),
        Seq((10L, 2L)).toDF("doc", "rank")), "doc", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ok == Seq((10L, 2L)))
  }

  test("equal scores break ties on the doc key; topK truncates") {
    // docs 5 and 3 each appear at rank 1 of ONE run -> identical rrf
    val r1 = Seq((5L, 1L), (9L, 2L)).toDF("doc", "rank")
    val r2 = Seq((3L, 1L), (9L, 2L)).toDF("doc", "rank")
    val got = Retrieval.rrfFuse(Seq(r1, r2), "doc", "rank", kc = 60,
        topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L, 3L))
  }
}
