package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Eval.rocAuc]] / [[Eval.avgPrecision]] against brute-force pairwise
  * and hand-computed references — ties, inversions, and the
  * single-class loud guard. */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("rocAuc equals the brute-force pairwise count on random scores") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      // coarse scores force heavy ties; label correlates weakly
      val sc = rng.nextInt(12) / 10.0
      (i.toLong, sc, rng.nextDouble() < 0.3 + sc / 3)
    }
    val df = rows.toDF("id", "score", "label")
    val got = Eval.rocAuc(df, "score", "label", v => floor(v * 5))
      .collect().head
    val pos = rows.filter(_._3).map(_._2)
    val neg = rows.filterNot(_._3).map(_._2)
    val conc = (for (p <- pos; q <- neg) yield p > q).count(identity).toLong
    val tied = (for (p <- pos; q <- neg) yield p == q).count(identity).toLong
    assert(got.getLong(0) == pos.length && got.getLong(1) == neg.length)
    assert(got.getLong(2) == conc, "concordant")
    assert(got.getLong(3) == tied, "tied")
    assert(got.getDouble(4) ==
      (2L * conc + tied).toDouble / (2L * pos.length * neg.length))
  }

  test("rocAuc: perfect, inverted, and coin-flip rankings") {
    def auc(rows: Seq[(Double, Boolean)]): Double =
      Eval.rocAuc(rows.zipWithIndex.map { case ((s, l), i) =>
          (i.toLong, s, l) }.toDF("id", "score", "label"),
        "score", "label", v => floor(v * 10))
        .collect().head.getDouble(4)
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    val inverted = perfect.map { case (s, l) => (s, !l) }
    val allTied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
    assert(auc(perfect) == 1.0)
    assert(auc(inverted) == 0.0)
    assert(auc(allTied) == 0.5)
  }

  test("avgPrecision hand case with a tie group") {
    // scores desc: 0.9(+), 0.7 {+,-} tied, 0.3(-), 0.1(+); n1=3, n0=2
    // thresholds: s=0.9: tp=1 atk=1 -> term (1/3)*1
    //             s=0.7: tp=2 atk=3 -> term (1/3)*(2/3)
    //             s=0.1: tp=3 atk=5 -> term (1/3)*(3/5)
    val df = Seq((1L, 0.9, true), (2L, 0.7, true), (3L, 0.7, false),
      (4L, 0.3, false), (5L, 0.1, true)).toDF("id", "score", "label")
    val got = Eval.avgPrecision(df, "score", "label", v => floor(v * 10))
      .collect().head
    val want = BigDecimal(1.0 / 3 * (1.0 + 2.0 / 3 + 3.0 / 5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 3L && got.getLong(1) == 2L)
    assert(math.abs(got.getDouble(2) - want) < 1e-9, s"got $got want $want")
  }

  test("single-class input raises loudly") {
    val df = Seq((1L, 0.4, true), (2L, 0.6, true)).toDF("id", "s", "l")
    val ex = intercept[Exception] {
      Eval.rocAuc(df, "s", "l", v => floor(v * 10)).collect()
    }
    assert(ex.getMessage.contains("both classes"))
  }

  test("fleiss kappa textbook hand-count (N=2, r=3, two categories)") {
    // item 1: a,a,b ; item 2: b,b,b — P̄ = 8/12, Pe = 20/36,
    // kappa = (2/3 − 5/9)/(1 − 5/9) = 0.25 exactly
    val df = Seq((1, 1, "a"), (1, 2, "a"), (1, 3, "b"),
      (2, 1, "b"), (2, 2, "b"), (2, 3, "b")).toDF("item", "rater", "cat")
    val got = Eval.fleissKappa(df, "item", "rater", "cat").collect().head
    assert(got.getLong(0) == 2L && got.getLong(1) == 3L)
    assert(got.getDouble(2) === 0.25, got.toString)
  }

  test("fleiss kappa raises on unbalanced designs, duplicate " +
      "(item, rater) ratings, and single-category tables") {
    val unbal = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "b"))
      .toDF("item", "rater", "cat")
    val e1 = intercept[Exception] {
      Eval.fleissKappa(unbal, "item", "rater", "cat").collect()
    }
    assert(e1.getMessage.contains("unbalanced"), e1.getMessage)
    val dup = Seq((1, 1, "a"), (1, 1, "b"), (2, 1, "a"), (2, 2, "b"))
      .toDF("item", "rater", "cat")
    val e2 = intercept[Exception] {
      Eval.fleissKappa(dup, "item", "rater", "cat").collect()
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val mono = Seq((1, 1, "a"), (1, 2, "a"), (2, 1, "a"), (2, 2, "a"))
      .toDF("item", "rater", "cat")
    val e3 = intercept[Exception] {
      Eval.fleissKappa(mono, "item", "rater", "cat").collect()
    }
    assert(e3.getMessage.contains("pe = 1"), e3.getMessage)
  }

  test("mccMulticlass equals the binary MCC closed form on a 2x2 table") {
    // TP=6 FP=1 FN=2 TN=3: binary MCC = 16/sqrt(7*8*4*5);
    // Gorodkin: num=9*12-76=32, d1=144-74=70, d2=144-80=64
    val rows = Seq.fill(6)(("P", "P")) ++ Seq.fill(2)(("P", "N")) ++
      Seq.fill(1)(("N", "P")) ++ Seq.fill(3)(("N", "N"))
    val df = rows.toDF("actual", "pred")
    val r = Eval.mccMulticlass(df, "actual", "pred").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((12L, 9L)))
    val want = 16.0 / math.sqrt(7.0 * 8 * 4 * 5)
    assert(math.abs(r.getDouble(2) - want) < 1e-12, r.toString)
    // perfect prediction on 3 classes → 1.0
    val perf = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("actual", "pred")
    val rp = Eval.mccMulticlass(perf, "actual", "pred").collect().head
    assert(math.abs(rp.getDouble(2) - 1.0) < 1e-12, rp.toString)
  }

  test("mccMulticlass raises on degenerate marginals and empty input") {
    val onePred = Seq(("a", "x"), ("b", "x"), ("a", "x"))
      .toDF("actual", "pred")
    val e1 = intercept[Exception] {
      Eval.mccMulticlass(onePred, "actual", "pred").collect()
    }
    assert(e1.getMessage.contains("degenerate marginals"), e1.getMessage)
    val empty = Seq.empty[(String, String)].toDF("actual", "pred")
    val e2 = intercept[Exception] {
      Eval.mccMulticlass(empty, "actual", "pred").collect()
    }
    assert(e2.getMessage.contains("empty confusion"), e2.getMessage)
  }

  test("mcnemar: discordant-only chi2 with continuity correction") {
    // both-right x5, A-only x4, B-only x1, both-wrong x2:
    // b=4, c=1, chi2 = (|3|-1)^2 / 5 = 0.8
    val rows = Seq.fill(5)((true, true)) ++ Seq.fill(4)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(2)((false, false))
    val r = Eval.mcnemar(rows.toDF("a_ok", "b_ok"), "a_ok", "b_ok")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((12L, 5L, 4L, 1L)))
    assert(r.getDouble(4) === 0.8, r.toString)
    // b = c keeps the conventional corrected 1/(b+c)
    val bal = Seq((true, false), (false, true)).toDF("a_ok", "b_ok")
    val rb = Eval.mcnemar(bal, "a_ok", "b_ok").collect().head
    assert(rb.getDouble(4) === 0.5, rb.toString)
    val agree = Seq((true, true), (false, false)).toDF("a_ok", "b_ok")
    val e = intercept[Exception] {
      Eval.mcnemar(agree, "a_ok", "b_ok").collect()
    }
    assert(e.getMessage.contains("never disagree"), e.getMessage)
  }

  test("bucketed cum form is invariant to bucket granularity") {
    val rng = new scala.util.Random(5)
    val rows = (1 to 300).map(i =>
      (i.toLong, rng.nextDouble(), rng.nextBoolean()))
    val df = rows.toDF("id", "score", "label")
    val fine = Eval.rocAuc(df, "score", "label", v => floor(v * 1000))
      .collect().head.toSeq
    val coarse = Eval.rocAuc(df, "score", "label", v => floor(v * 2))
      .collect().head.toSeq
    val one = Eval.rocAuc(df, "score", "label", _ => lit(0L))
      .collect().head.toSeq
    assert(fine == coarse && coarse == one)
  }

  test("krippendorffAlpha hand-computed on an unbalanced design; " +
      "single-rating items drop; degenerates raise") {
    import spark.implicits._
    // A: {1,1} agree (m=2); B: {1,2} disagree (m=2); C: {2,2,2} agree
    // (m=3); D: one rating -> drops. n=7, n_1=3, n_2=4,
    // dOff = 0 + 2/(2-1)... off_m2 = (4-4)+(4-2) = 2, off_m3 = 0
    // alpha = 1 - 6*2/(49-25) = 0.5
    val df = Seq(
      ("A", "r1", "1"), ("A", "r2", "1"),
      ("B", "r1", "1"), ("B", "r2", "2"),
      ("C", "r1", "2"), ("C", "r2", "2"), ("C", "r3", "2"),
      ("D", "r1", "2")).toDF("item", "rater", "cat")
    val r = Eval.krippendorffAlpha(df, "item", "rater", "cat")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 3L, 2L)),
      r.toString)
    assert(r.getDouble(3) === 0.5, r.toString)
    // perfect agreement on 2 categories: alpha = 1
    val perf = Seq(("A", "r1", "x"), ("A", "r2", "x"),
      ("B", "r1", "y"), ("B", "r2", "y")).toDF("item", "rater", "cat")
    assert(Eval.krippendorffAlpha(perf, "item", "rater", "cat")
      .collect().head.getDouble(3) === 1.0)
    val mono = Seq(("A", "r1", "x"), ("A", "r2", "x"))
      .toDF("item", "rater", "cat")
    val e1 = intercept[Exception] {
      Eval.krippendorffAlpha(mono, "item", "rater", "cat").collect()
    }
    assert(e1.getMessage.contains("one category"), e1.getMessage)
    val dup = Seq(("A", "r1", "x"), ("A", "r1", "y"))
      .toDF("item", "rater", "cat")
    val e2 = intercept[Exception] {
      Eval.krippendorffAlpha(dup, "item", "rater", "cat").collect()
    }
    assert(e2.getMessage.contains("duplicate (item, rater)"),
      e2.getMessage)
    val lone = Seq(("A", "r1", "x"), ("B", "r1", "y"))
      .toDF("item", "rater", "cat")
    val e3 = intercept[Exception] {
      Eval.krippendorffAlpha(lone, "item", "rater", "cat").collect()
    }
    assert(e3.getMessage.contains("2+ ratings"), e3.getMessage)
  }
  // moved from AgreementSpec (round 13: specs named for what they test)
  test("kappa: hand-computed 2x2, perfect = 1, symmetric-random ≈ 0") {
    // classic 2x2: a/a 20, a/b 5, b/a 10, b/b 15
    val rows = Seq.fill(20)(("a", "a")) ++ Seq.fill(5)(("a", "b")) ++
      Seq.fill(10)(("b", "a")) ++ Seq.fill(15)(("b", "b"))
    val got = Eval.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .collect().head
    val n = 50.0
    val po = 35.0 / n
    val pe = (25.0 * 30 + 25.0 * 20) / (n * n)
    assert(got.getLong(0) == 50 && got.getLong(1) == 35)
    assert(got.getDouble(2) == po && got.getDouble(3) == pe)
    assert(got.getDouble(4) == (po - pe) / (1.0 - pe))
    // perfect agreement
    val p = Eval.cohenKappa(Seq(("x", "x"), ("y", "y"), ("z", "z"))
      .toDF("r1", "r2"), "r1", "r2").collect().head
    assert(p.getDouble(4) == 1.0)
  }

  test("kappa: total chance agreement raises (pe = 1)") {
    val rows = Seq.fill(5)(("a", "a"))
    val e = intercept[Exception] {
      Eval.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2").collect()
    }
    assert(e.getMessage.contains("pe = 1"))
  }

  test("cochranQ hand-computed: Q=3 and invariant to all-equal items") {
    import spark.implicits._
    // C=[3,2,1], T=6, R=[2,1,3,0], ΣR²=14:
    // Q = 2·(3·14_C² − 36)/(18 − 14) = 2·(42−36)/4 = 3
    val base = Seq(
      (1, "A", true), (1, "B", true), (1, "C", false),
      (2, "A", true), (2, "B", false), (2, "C", false))
    val allEq = Seq(
      (3, "A", true), (3, "B", true), (3, "C", true),
      (4, "A", false), (4, "B", false), (4, "C", false))
    val r = Eval.cochranQ((base ++ allEq).toDF("i", "t", "s"),
      "i", "t", "s").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 3L)), r.toString)
    assert(math.abs(r.getAs[Double]("q") - 3.0) < 1e-12, r.toString)
    // Cochran's Q is invariant to all-success/all-failure items —
    // dropping them must give the identical statistic
    val r2 = Eval.cochranQ(base.toDF("i", "t", "s"), "i", "t", "s")
      .collect().head
    assert(math.abs(r2.getAs[Double]("q") - 3.0) < 1e-12, r2.toString)
  }

  test("cochranQ raises loudly on broken designs") {
    import spark.implicits._
    // missing cell: item 2 has no C
    val miss = Seq((1, "A", true), (1, "B", true), (1, "C", false),
      (2, "A", true), (2, "B", false))
    val e1 = intercept[Exception] {
      Eval.cochranQ(miss.toDF("i", "t", "s"), "i", "t", "s").collect()
    }
    assert(e1.getMessage.contains("incomplete design"), e1.getMessage)
    // duplicate cell
    val dup = Seq((1, "A", true), (1, "A", false), (1, "B", true),
      (2, "A", true), (2, "B", false))
    val e2 = intercept[Exception] {
      Eval.cochranQ(dup.toDF("i", "t", "s"), "i", "t", "s").collect()
    }
    assert(e2.getMessage.contains("duplicate (item, treatment)"),
      e2.getMessage)
    // no within-item variation: Q is 0/0
    val flat = Seq((1, "A", true), (1, "B", true),
      (2, "A", false), (2, "B", false))
    val e3 = intercept[Exception] {
      Eval.cochranQ(flat.toDF("i", "t", "s"), "i", "t", "s").collect()
    }
    assert(e3.getMessage.contains("no within-item variation"),
      e3.getMessage)
    // a null success cell is a loud raise, not a silent drop
    val nul = Seq((1, "A", Some(true)), (1, "B", None),
      (2, "A", Some(true)), (2, "B", Some(false)))
    val e4 = intercept[Exception] {
      Eval.cochranQ(nul.toDF("i", "t", "s"), "i", "t", "s").collect()
    }
    assert(e4.getMessage.contains("null success cell"), e4.getMessage)
    // r14 ADVICE: the design raise must survive a q-only projection —
    // Catalyst prunes unreferenced columns, so the guards have to ride
    // the q expression itself (the anovaF/leveneBF precedent)
    val e5 = intercept[Exception] {
      Eval.cochranQ(miss.toDF("i", "t", "s"), "i", "t", "s")
        .select("q").collect()
    }
    assert(e5.getMessage.contains("incomplete design"), e5.getMessage)
  }


  test("mantelHaenszel: two hand strata pool to OR 5.347826, chi2 " +
      "3.640777; degenerates raise") {
    import spark.implicits._
    // S1: a=4 b=1 c=2 d=3; S2: a=6 b=2 c=3 d=5
    def stratum(h: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((h, true, true)) ++ Seq.fill(b)((h, true, false)) ++
        Seq.fill(c)((h, false, true)) ++ Seq.fill(d)((h, false, false))
    val rows = stratum("s1", 4, 1, 2, 3) ++ stratum("s2", 6, 2, 3, 5)
    val got = Eval.mantelHaenszel(rows.toDF("h", "arm", "out"),
      "h", "arm", "out").collect().head
    // OR_MH = (1.2 + 1.875) / (0.2 + 0.375); chi2 = (10-7.5)^2 /
    // (2/3 + 1.05)
    assert(got.getLong(0) == 2 && got.getLong(1) == 26 &&
      got.getLong(2) == 10, got.toString)
    assert(got.getDouble(3) == 5.347826, got.toString)
    assert(got.getDouble(4) == 3.640777, got.toString)
    val e1 = intercept[Exception] {
      Eval.mantelHaenszel(stratum("s1", 4, 1, 2, 3)
        .toDF("h", "arm", "out"), "h", "arm", "out").collect()
    }
    assert(e1.getMessage.contains("at least 2 strata"), e1.getMessage)
    val tiny = (stratum("s1", 4, 1, 2, 3) ++ Seq(("s2", true, true)))
      .toDF("h", "arm", "out")
    val e2 = intercept[Exception] {
      Eval.mantelHaenszel(tiny, "h", "arm", "out").collect()
    }
    assert(e2.getMessage.contains("fewer than 2 rows"), e2.getMessage)
    // no discordant mass anywhere -> OR infinite
    val conc = (Seq.fill(2)(("s1", true, true)) ++
      Seq.fill(2)(("s1", false, false)) ++
      Seq.fill(2)(("s2", true, true)) ++
      Seq.fill(2)(("s2", false, false))).toDF("h", "arm", "out")
    val e3 = intercept[Exception] {
      Eval.mantelHaenszel(conc, "h", "arm", "out").collect()
    }
    assert(e3.getMessage.contains("infinite"), e3.getMessage)
  }

  test("cronbachAlpha: perfectly parallel items give alpha 1, " +
      "shuffled items go negative; degenerates raise") {
    import spark.implicits._
    def long(rows: Seq[(Int, Int, Int)]) =
      rows.flatMap { case (s, i1, i2) =>
        Seq((s, "i1", i1), (s, "i2", i2)) }.toDF("subj", "item", "v")
    // item2 = item1 + 1: totals 3,5,7,9 -> alpha = 2*(1 - 40/80) = 1
    val par = long(Seq((1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 4, 5)))
    val a1 = Eval.cronbachAlpha(par, "subj", "item", "v").collect().head
    assert(a1.getLong(0) == 4 && a1.getLong(1) == 2, a1.toString)
    assert(math.abs(a1.getDouble(2) - 1.0) < 1e-15, a1.toString)
    // item2 shuffled (5,3,2,4): totals 6,5,5,8 -> alpha = 2*(1-40/24)
    val shuf = long(Seq((1, 1, 5), (2, 2, 3), (3, 3, 2), (4, 4, 4)))
    val a2 = Eval.cronbachAlpha(shuf, "subj", "item", "v").collect().head
    assert(math.abs(a2.getDouble(2) - (2.0 * (1.0 - 40.0 / 24.0))) <
      1e-15, a2.toString)
    val incomplete = Seq((1, "i1", 1), (1, "i2", 2), (2, "i1", 3))
      .toDF("subj", "item", "v")
    val e1 = intercept[Exception] {
      Eval.cronbachAlpha(incomplete, "subj", "item", "v").collect()
    }
    assert(e1.getMessage.contains("incomplete design"), e1.getMessage)
    val flat = long(Seq((1, 1, 2), (2, 2, 1)))
    val e2 = intercept[Exception] {
      Eval.cronbachAlpha(flat, "subj", "item", "v").collect()
    }
    assert(e2.getMessage.contains("zero total-score variance"),
      e2.getMessage)
    val nul = Seq((1, "i1", Some(1)), (1, "i2", None))
      .toDF("subj", "item", "v")
    val e3 = intercept[Exception] {
      Eval.cronbachAlpha(nul, "subj", "item", "v").collect()
    }
    assert(e3.getMessage.contains("null subject/item/value"),
      e3.getMessage)
  }

  test("cronbachAlpha raises on fractional scores instead of silently " +
      "truncating them in the long cast") {
    import spark.implicits._
    val frac = Seq((1, "i1", 3.7), (1, "i2", 2.0),
      (2, "i1", 1.0), (2, "i2", 4.0)).toDF("subj", "item", "v")
    val e = intercept[Exception] {
      Eval.cronbachAlpha(frac, "subj", "item", "v").collect()
    }
    assert(e.getMessage.contains("non-integer score"), e.getMessage)
    // integer-valued doubles are fine (2.0 == 2L exactly)
    val ok = Seq((1, "i1", 1.0), (1, "i2", 2.0),
      (2, "i1", 3.0), (2, "i2", 5.0)).toDF("subj", "item", "v")
    assert(Eval.cronbachAlpha(ok, "subj", "item", "v").collect()
      .length == 1)
  }
}
