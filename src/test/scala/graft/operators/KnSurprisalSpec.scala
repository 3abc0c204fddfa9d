package graft.operators

import graft.SparkSpec

/** [[TextScore.knBigramSurprisal]]: hand-computed Kneser–Ney fixture,
  * a driver-side reference over the real corpus, and the continuation
  * property that separates KN from plain interpolation. */
class KnSurprisalSpec extends SparkSpec {
  import spark.implicits._

  test("hand fixture: every probability term is exact") {
    // corpus: "a b a b" + "b a" -> big: (a,b):2, (b,a):2
    // ctx a: cv=2 n1v=1; ctx b: cv=2 n1v=1; cont a/b: n1w=1; n1t=2
    // P = max(2-.75,0)/2 + .75*1/2*(1/2) = 0.625 + 0.1875 = 0.8125
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = TextScore.knBigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val want = BigDecimal(-math.log(0.8125))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, want)) && got(2L) == ((1L, want)), s"$got")
  }

  test("matches a driver-side reference on the real corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val got = TextScore.knBigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val corpus = docs.as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val bigrams = corpus.map { case (id, tk) =>
      id -> tk.sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq }
    val cb = bigrams.flatMap(_._2).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val cv = cb.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val n1v = cb.groupBy(_._1._1).map { case (p, m) => p -> m.size.toLong }
    val n1w = cb.groupBy(_._1._2).map { case (c, m) => c -> m.size.toLong }
    val n1t = cb.size.toLong
    def p(bg: (String, String)): Double =
      math.max(cb(bg) - 0.75, 0.0) / cv(bg._1) +
        0.75 * n1v(bg._1) / cv(bg._1) * (n1w(bg._2).toDouble / n1t)
    var checked = 0
    bigrams.filter(_._2.nonEmpty).foreach { case (id, bgs) =>
      val want = bgs.map(b => -math.log(p(b))).sum / bgs.length
      val (n, score) = got(id)
      assert(n == bgs.length, s"doc $id n_bigrams")
      // the operator sums in partition order and rounds 6dp — allow
      // one grid step of the rounding
      assert(math.abs(score - want) < 2e-6,
        s"doc $id: $score vs reference $want")
      checked += 1
    }
    assert(checked > 100 && got.size == checked)
  }

  test("continuation backoff penalizes a frequent-but-glued word") {
    // "np" occurs MANY times but only ever after "the" (one context);
    // "of" occurs the same number of times across many contexts. In a
    // fresh context both back off: the continuation distribution must
    // score "of" likelier than "np" even at equal unigram frequency.
    val glue = (1L to 20L).map(i => (i, "the np"))
    val spread = (21L to 40L).map(i => (i, s"w$i of"))
    val probes = Seq((98L, "x1 x2 np np"), (99L, "x1 x2 of of"))
    val docs = (glue ++ spread ++ probes ++
      Seq((100L, "x1 x2 x1 x2"))).toDF("doc_id", "text")
    val got = TextScore.knBigramSurprisal(docs, "doc_id", "text")
      .select("doc_id", "avg_kn_surprisal").as[(Long, Double)]
      .collect().toMap
    assert(got(99L) < got(98L),
      s"many-context 'of' must beat one-context 'np': $got")
  }
}
