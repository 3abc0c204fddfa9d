package graft.operators

import graft.SparkSpec

/** Hand-computed retrieval metrics on a closed-form fixture, plus the
  * no-relevant / no-judgments edges. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)

  test("precision/recall/MRR/nDCG@3 match the hand computation") {
    val run = Seq(("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3),
      ("q", "d4", 4), ("q", "d5", 5)).toDF("query", "doc", "rank")
    val qrels = Seq(("q", "d2", 2L), ("q", "d4", 1L), ("q", "d9", 3L))
      .toDF("query", "doc", "grade")
    val r = Retrieval.evaluate(run, qrels, "query", "doc", "rank",
      "grade", k = 3).collect().head
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Long]("rel_ret") === 1L)
    assert(r.getAs[Double]("precision_at_k") === 1.0 / 3)
    assert(r.getAs[Double]("recall_at_k") === 1.0 / 3)
    assert(r.getAs[Double]("mrr_at_k") === 0.5)
    // dcg = 0 + 2/log2(3) + 0 ; idcg over grades [3,2,1]
    val dcg = 0.0 + 2.0 / log2(3) + 0.0
    val idcg = 0.0 + 3.0 / log2(2) + 2.0 / log2(3) + 1.0 / log2(4)
    val want = BigDecimal(dcg / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ndcg_at_k") === want)
  }

  test("no relevant retrieved: zero metrics, not nulls") {
    val run = Seq(("q", "d1", 1), ("q", "d2", 2)).toDF("query", "doc", "rank")
    val qrels = Seq(("q", "d9", 1L)).toDF("query", "doc", "grade")
    val r = Retrieval.evaluate(run, qrels, "query", "doc", "rank",
      "grade", k = 2).collect().head
    assert(r.getAs[Long]("rel_ret") === 0L)
    assert(r.getAs[Double]("mrr_at_k") === 0.0)
    assert(r.getAs[Double]("ndcg_at_k") === 0.0)
    assert(r.getAs[Double]("recall_at_k") === 0.0)
  }

  test("query with no judgments: n_rel 0, rate metrics null") {
    val run = Seq(("q", "d1", 1)).toDF("query", "doc", "rank")
    val qrels = Seq(("other", "d1", 1L)).toDF("query", "doc", "grade")
    val r = Retrieval.evaluate(run, qrels, "query", "doc", "rank",
      "grade", k = 1).filter($"query" === "q").collect().head
    assert(r.getAs[Long]("n_rel") === 0L)
    assert(r.isNullAt(r.fieldIndex("recall_at_k")))
    assert(r.isNullAt(r.fieldIndex("ndcg_at_k")))
  }

  test("perfect ranking scores nDCG 1") {
    val run = Seq(("q", "a", 1), ("q", "b", 2), ("q", "c", 3))
      .toDF("query", "doc", "rank")
    val qrels = Seq(("q", "a", 3L), ("q", "b", 2L), ("q", "c", 1L))
      .toDF("query", "doc", "grade")
    val r = Retrieval.evaluate(run, qrels, "query", "doc", "rank",
      "grade", k = 3).collect().head
    assert(r.getAs[Double]("ndcg_at_k") === 1.0)
    assert(r.getAs[Double]("recall_at_k") === 1.0)
    assert(r.getAs[Double]("mrr_at_k") === 1.0)
  }

  test("query whose results all fall past k surfaces with zero " +
      "metrics instead of vanishing") {
    val run = Seq(("hit", "a", 1), ("miss", "b", 5), ("miss", "c", 6))
      .toDF("query", "doc", "rank")
    val qrels = Seq(("hit", "a", 1L), ("miss", "b", 2L))
      .toDF("query", "doc", "grade")
    val out = Retrieval.evaluate(run, qrels, "query", "doc", "rank",
      "grade", k = 3).collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("hit", "miss"),
      "one row per query present in run")
    val miss = out("miss")
    assert(miss.getAs[Long]("n_rel") === 1L)
    assert(miss.getAs[Long]("rel_ret") === 0L)
    assert(miss.getAs[Double]("precision_at_k") === 0.0)
    assert(miss.getAs[Double]("recall_at_k") === 0.0)
    assert(miss.getAs[Double]("mrr_at_k") === 0.0)
    assert(miss.getAs[Double]("ndcg_at_k") === 0.0)
  }
}
