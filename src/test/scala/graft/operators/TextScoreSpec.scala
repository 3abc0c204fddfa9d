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

  test("PMI matches hand-computed counts on a glued-pair fixture") {
    // bigrams: d1 → (new,york)×2 (york,new); d2 → 5 singletons;
    // d3 → (the,cat)×2 (cat,new) (new,york) (york,the). T = 13.
    // unigrams: new=3 york=3 the=4 cat=3. Survivors at minCount=2:
    // (new,york)=3 (the glued pair) and (the,cat)=3 (the chance pair,
    // diluted by 'the' appearing outside it).
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "the cat sat on the mat"),
      (3L, "the cat new york the cat")).toDF("doc_id", "text")
    val got = TextScore.pmiCollocations(docs, "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.size == 2, s"only the two repeated pairs survive: $got")
    assert(got(("new", "york")) ==
      ((3L, 3L, 3L, r6(math.log(13.0 * 3 / (3.0 * 3))))))
    assert(got(("the", "cat")) ==
      ((3L, 4L, 3L, r6(math.log(13.0 * 3 / (4.0 * 3))))))
    assert(got(("new", "york"))._4 > got(("the", "cat"))._4,
      "the glued pair must out-score the chance pair")
  }

  test("rare-token docs score strictly higher than common-token docs") {
    val docs = (Seq((1L, "x x x x x x x x"), (2L, "x x x x x x x rare")) ++
      (3L to 10L).map(i => (i, "x x"))).toDF("doc_id", "text")
    val got = TextScore.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(2L) > got(1L), "the rare token must raise doc 2's surprisal")
  }

  test("token entropy: hand-computed values and degeneracy ordering") {
    val docs = Seq(
      (1L, "a a b"),          // H = ln3 − (2·ln2)/3, ttr = 2/3
      (2L, "a a a a"),        // single type: H = 0, ttr = 1/4
      (3L, "a b c d")         // uniform: H = ln4, ttr = 1
    ).toDF("doc_id", "text")
    val got = TextScore.tokenEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((3L, 2L, 2.0 / 3.0,
      r6(math.log(3.0) - 2 * math.log(2.0) / 3))))
    assert(got(2L) == ((4L, 1L, 0.25, 0.0)))
    assert(got(3L) == ((4L, 4L, 1.0, r6(math.log(4.0)))))
    // repetitive text scores lower than diverse text
    assert(got(2L)._4 < got(1L)._4 && got(1L)._4 < got(3L)._4)
  }

  test("fightin' words: sign tracks the favored slice, the Dirichlet " +
      "prior shrinks rare terms harder than common ones") {
    import spark.implicits._
    // slice A says "aa" a lot and "rare" once; B says "bb" a lot
    val docs = Seq(
      ("A", ("aa " * 30) + ("cc " * 30) + "rare"),
      ("B", ("bb " * 30) + ("cc " * 30) + "x")
    ).toDF("slice", "text")
    val got = TextScore.logOddsDirichlet(docs, "text", "slice",
        "A", "B", alpha0 = 10.0, minCount = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got("aa")._3 > 0, "A-heavy term must score positive")
    assert(got("bb")._3 < 0, "B-heavy term must score negative")
    assert(math.abs(got("cc")._3) < 0.5, "balanced term near zero")
    // "rare" is 1-0 toward A but the prior shrinks it far below the
    // 30-0 "aa" — the shrinkage that raw log-odds ratios get wrong
    assert(got("rare")._3 > 0 && got("rare")._3 < got("aa")._3 / 2)
  }

  test("llrKeyness matches the hand-computed Dunning G2 with signs") {
    // A: "x x y", B: "x y y y" → x:(2,1), y:(1,3); ta=3, tb=4
    val docs = Seq(("a", "x x y"), ("b", "x y y y")).toDF("s", "text")
    val got = TextScore.llrKeyness(docs, "text", "s", "a", "b",
        minCount = 1, topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap
    def g2(ya: Double, yb: Double, ta: Double, tb: Double): Double = {
      val ea = ta * (ya + yb) / (ta + tb)
      val eb = tb * (ya + yb) / (ta + tb)
      val la = if (ya > 0) ya * math.log(ya / ea) else 0.0
      val lb = if (yb > 0) yb * math.log(yb / eb) else 0.0
      BigDecimal(2.0 * (la + lb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("x")._1 == 2L && got("x")._2 == 1L)
    assert(math.abs(got("x")._3 - g2(2, 1, 3, 4)) < 1e-12, got("x"))
    assert(got("x")._4 == 1, "x overrepresented in A")
    assert(math.abs(got("y")._3 - g2(1, 3, 3, 4)) < 1e-12, got("y"))
    assert(got("y")._4 == -1, "y overrepresented in B")
  }

  test("llrKeyness raises on an empty slice; zero-count sides score") {
    val docs = Seq(("a", "x y"), ("a", "x")).toDF("s", "text")
    val e = intercept[Exception] {
      TextScore.llrKeyness(docs, "text", "s", "a", "b", minCount = 1)
        .collect()
    }
    assert(e.getMessage.contains("empty slice"), e.getMessage)
    // a term present only in B still gets a finite G2 (x*ln x → 0)
    val two = Seq(("a", "x x"), ("b", "z z z")).toDF("s", "text")
    val r = TextScore.llrKeyness(two, "text", "s", "a", "b",
        minCount = 1, topK = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(r("z") > 0 && !r("z").isNaN && !r("z").isInfinite)
  }

  test("jsdBuckets: identical corpora give 0, disjoint give ln 2") {
    val a = Seq.tabulate(4)(i => Tuple1(s"alpha beta gamma d$i"))
      .toDF("text")
    val same = TextScore.jsdBuckets(a, a, "text").collect().head
    assert(same.getDouble(3) === 0.0, same.toString)
    assert(same.getLong(0) == same.getLong(1))
    // fully disjoint vocabularies: JSD = ln 2 (each side's whole mass
    // faces a zero on the other) — holds whenever no bucket collides
    val b = Seq(Tuple1("omega psi chi rho")).toDF("text")
    val dis = TextScore.jsdBuckets(a, b, "text").collect().head
    assert(math.abs(dis.getDouble(3) - math.log(2.0)) < 1e-6,
      dis.toString)
    val e = intercept[Exception] {
      TextScore.jsdBuckets(a, b.filter(b("text") === "nope"), "text")
        .collect()
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
  }

  test("zipfFit: OLS over ln rank/freq matches the closed-form " +
      "reference; degenerate vocab raises") {
    import spark.implicits._
    // freqs 4, 2, 1 at ranks 1, 2, 3 (ties impossible by construction)
    val docs = Seq("a a a a b b c").toDF("text")
    val r = TextScore.zipfFit(docs, "text", topK = 10).collect().head
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    assert(r.getLong(0) == 3L, r.toString)
    assert(math.abs(r.getDouble(1) - slope) < 1e-6, r.toString)
    assert(math.abs(r.getDouble(2) - icept) < 1e-6, r.toString)
    assert(r.getDouble(1) < -0.5 && r.getDouble(1) > -1.5, r.toString)
    val tiny = Seq("a a b").toDF("text")
    val e = intercept[Exception] {
      TextScore.zipfFit(tiny, "text", topK = 10).collect()
    }
    assert(e.getMessage.contains("fewer than 3 distinct terms"),
      e.getMessage)
  }

  test("heapsFit: checkpoint growth curve matches the closed-form OLS; " +
      "degenerates raise") {
    import spark.implicits._
    // ids 0..4, G=4 ⇒ checkpoints 1,2,3,4:
    // N=[4,6,8,9] tokens, V=[3,4,4,5] types
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "b d"),
      (3L, "a a"), (4L, "e")).toDF("doc_id", "text")
    val r = TextScore.heapsFit(docs, "doc_id", "text", gridSize = 4)
      .collect().head
    val xs = Seq(4.0, 6.0, 8.0, 9.0).map(math.log)
    val ys = Seq(3.0, 4.0, 4.0, 5.0).map(math.log)
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - beta * sx) / n
    assert(r.getLong(0) == 4L && r.getLong(1) == 9L && r.getLong(2) == 5L,
      r.toString)
    assert(math.abs(r.getAs[Double]("beta") - beta) < 1e-6, r.toString)
    assert(math.abs(r.getAs[Double]("intercept") - icept) < 1e-6,
      r.toString)
    // a single distinct order value has no curve
    val one = Seq((7L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      TextScore.heapsFit(one, "doc_id", "text").collect()
    }
    assert(e1.getMessage.contains("single value"), e1.getMessage)
    // every checkpoint sees the same tokens: the fit is 0/0
    val flat = Seq((0L, "a b c d"), (100L, "")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      TextScore.heapsFit(flat, "doc_id", "text", gridSize = 4).collect()
    }
    assert(e2.getMessage.contains("zero token growth"), e2.getMessage)
  }

  test("scriptMix: Latin+Cyrillic and Latin+Greek confusables counted " +
      "per token; pure-script tokens pass") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p\u0430ypal is not paypal"),             // Cyrillic а
      (2L, "\u03b1lpha beta \u03b3amma"),           // Greek α, γ
      (3L, "\u043f\u0440\u0438\u0432\u0435\u0442 hello")) // pure ru + en
      .toDF("doc_id", "text")
    val got = TextScore.scriptMix(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((1L, 4L, 1L, 0L), (2L, 3L, 0L, 2L),
      (3L, 2L, 0L, 0L)), got)
  }
}
