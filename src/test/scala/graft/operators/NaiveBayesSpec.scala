package graft.operators

import graft.SparkSpec

/** NB on a planted 4-doc corpus where every smoothed probability is a
  * hand-computable rational: the model must hit the exact ln values and
  * classification must apply priors, seen tokens, and the unseen floor. */
class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  // fruit: "apple banana", "apple apple" → N=4 tokens
  // veg:   "carrot potato", "potato potato carrot" → N=5 tokens
  // V = 4 (apple, banana, carrot, potato)
  private val docs = Seq(
    (1L, "apple banana", "fruit"), (2L, "apple apple", "fruit"),
    (3L, "carrot potato", "veg"), (4L, "potato potato carrot", "veg"))
    .toDF("doc_id", "text", "lang").repartition(3)

  test("train: exact smoothed log-probabilities") {
    val m = NaiveBayes.train(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m(("fruit", "apple")) == ((3L, math.log(4.0 / 8.0))))
    assert(m(("fruit", "banana")) == ((1L, math.log(2.0 / 8.0))))
    assert(m(("veg", "potato")) == ((3L, math.log(4.0 / 9.0))))
    assert(m(("veg", "carrot")) == ((2L, math.log(3.0 / 9.0))))
    // zero-count pairs are absent, not stored as smoothed rows
    assert(!m.contains(("fruit", "potato")) && m.size == 4)
  }

  test("classStats: priors and unseen floors") {
    val st = NaiveBayes.classStats(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(st("fruit") == ((2L, 4L, math.log(0.5), math.log(1.0 / 8.0))))
    assert(st("veg") == ((2L, 5L, math.log(0.5), math.log(1.0 / 9.0))))
  }

  test("classify: seen tokens, unseen floor, argmax") {
    val model = NaiveBayes.train(docs, "doc_id", "text", "lang")
    val stats = NaiveBayes.classStats(docs, "doc_id", "text", "lang")
    val test = Seq((10L, "apple banana"), (11L, "potato kiwi"))
      .toDF("doc_id", "text")
    val got = NaiveBayes.classify(test, "doc_id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getDouble(2)))).toMap
    assert(got(10L)._1 == "fruit")
    assert(got(11L)._1 == "veg")
    // doc 10 score: ln(.5) + ln(4/8) + ln(2/8), rounded 6dp
    val want10 = BigDecimal(math.log(0.5) + math.log(0.5) + math.log(0.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._2 == want10)
    // doc 11 veg score: ln(.5) + ln(4/9) + unseen ln(1/9)
    val want11 = BigDecimal(math.log(0.5) + math.log(4.0 / 9.0) +
        math.log(1.0 / 9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(11L)._2 == want11)
  }

  test("classify: token-less docs fall back to prior alone — one row " +
      "per doc, never dropped") {
    val model = NaiveBayes.train(docs, "doc_id", "text", "lang")
    val stats = NaiveBayes.classStats(docs, "doc_id", "text", "lang")
    val test = Seq((20L, "apple banana"), (21L, ""), (22L, "   "))
      .toDF("doc_id", "text")
    val got = NaiveBayes.classify(test, "doc_id", "text", model, stats)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getDouble(2)))).toMap
    assert(got.keySet == Set(20L, 21L, 22L), "one row per doc id")
    // equal priors (2 docs each): tie breaks toward the smaller label
    val wantPrior = BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(21L) == (("fruit", wantPrior)))
    assert(got(22L) == (("fruit", wantPrior)))
  }
}
