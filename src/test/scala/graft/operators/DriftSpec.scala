package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("PSI matches the hand-computed closed form") {
    // baseline: bucket 0 ×8, bucket 1 ×2; candidate: bucket 0 ×2,
    // bucket 1 ×8. Union buckets B=2, smoothing 1:
    // p = (9/12, 3/12), q = (3/12, 9/12)
    // psi = (0.5)*ln(3) + (-0.5)*ln(1/3) = ln(3) ≈ 1.098612
    val a = (Seq.fill(8)(0) ++ Seq.fill(2)(1)).map(("g", _)).toDF("grp", "bk")
    val b = (Seq.fill(2)(0) ++ Seq.fill(8)(1)).map(("g", _)).toDF("grp", "bk")
    val r = Drift.psi(a, b, Seq("grp"), "bk").head()
    assert(r.getAs[Long]("n_buckets") == 2 && r.getAs[Long]("n_a") == 10 &&
      r.getAs[Long]("n_b") == 10)
    assert(math.abs(r.getAs[Double]("psi") - math.log(3.0)) < 1e-6)
  }

  test("identical snapshots give PSI 0; one-sided buckets stay finite") {
    val a = Seq(("g", 0), ("g", 0), ("g", 1)).toDF("grp", "bk")
    assert(Drift.psi(a, a, Seq("grp"), "bk").head()
      .getAs[Double]("psi") == 0.0)
    // bucket 2 only in candidate: smoothing keeps it finite
    val b = Seq(("g", 2), ("g", 2), ("g", 2)).toDF("grp", "bk")
    val psi = Drift.psi(a, b, Seq("grp"), "bk").head().getAs[Double]("psi")
    assert(!psi.isInfinite && !psi.isNaN && psi > 0.25)
  }

  test("global PSI (no group columns) computes over the whole table") {
    val a = (Seq.fill(8)(0) ++ Seq.fill(2)(1)).toDF("bk")
    val b = (Seq.fill(2)(0) ++ Seq.fill(8)(1)).toDF("bk")
    val r = Drift.psi(a, b, Seq.empty, "bk").collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_buckets") == 2 &&
      r.head.getAs[Long]("n_a") == 10 && r.head.getAs[Long]("n_b") == 10)
    assert(math.abs(r.head.getAs[Double]("psi") - math.log(3.0)) < 1e-6)
  }

  test("null group key merges into one group instead of splitting") {
    val a = (Seq.fill(8)(0) ++ Seq.fill(2)(1))
      .map((None: Option[String], _)).toDF("grp", "bk")
    val b = (Seq.fill(2)(0) ++ Seq.fill(8)(1))
      .map((None: Option[String], _)).toDF("grp", "bk")
    val rows = Drift.psi(a, b, Seq("grp"), "bk").collect()
    assert(rows.length == 1, s"null group must be ONE group: ${rows.toSeq}")
    assert(rows.head.getAs[Long]("n_buckets") == 2)
    assert(math.abs(rows.head.getAs[Double]("psi") - math.log(3.0)) < 1e-6)
  }

  test("KS matches the hand-computed closed form, argmax deterministic") {
    // a = {1,2,3,4}, b = {3,4,5,6}: Fa = (.25,.5,.75,1,1,1),
    // Fb = (0,0,.25,.5,.75,1) at v=1..6 → diff = (.25,.5,.5,.5,.25,0)
    // D = 0.5, first achieved at v = 2
    val a = Seq(1, 2, 3, 4).toDF("v")
    val b = Seq(3, 4, 5, 6).toDF("v")
    val r = Drift.ks(a, b, "v", x => floor(x / lit(2))).head()
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4)
    assert(r.getAs[Double]("d_stat") == 0.5)
    assert(r.getAs[Int]("d_value") == 2)
  }

  test("KS: identical samples give D = 0; disjoint give D = 1") {
    val a = Seq(1, 2, 3).toDF("v")
    assert(Drift.ks(a, a, "v", identity).head()
      .getAs[Double]("d_stat") == 0.0)
    val b = Seq(10, 11).toDF("v")
    assert(Drift.ks(a, b, "v", identity).head()
      .getAs[Double]("d_stat") == 1.0)
  }

  test("KS: result is bucket-choice-invariant") {
    val a = Seq(1, 5, 9, 13, 42).toDF("v")
    val b = Seq(2, 5, 40, 41).toDF("v")
    val fine = Drift.ks(a, b, "v", identity).head()
    val coarse = Drift.ks(a, b, "v", x => floor(x / lit(10))).head()
    assert(fine.getAs[Double]("d_stat") == coarse.getAs[Double]("d_stat"))
    assert(fine.getAs[Int]("d_value") == coarse.getAs[Int]("d_value"))
  }

  test("KS: empty snapshot raises in-plan; value windows stay bucketed") {
    val a = Seq(1, 2).toDF("v")
    val ex = intercept[Exception] {
      Drift.ks(a, a.filter(col("v") > 99), "v", identity).collect()
    }
    assert(ex.getMessage.contains("empty snapshot"))
    // BOTH sides empty must raise too (not emit a null junk row)
    val ex2 = intercept[Exception] {
      Drift.ks(a.filter(col("v") > 99), a.filter(col("v") > 99),
        "v", identity).collect()
    }
    assert(ex2.getMessage.contains("empty snapshot"))
    // every window over VALUE rows must be bucket-partitioned; the only
    // unpartitioned windows run over bucket/total aggregates
    val p = Drift.ks(a, a, "v", x => floor(x / lit(2)))
      .queryExecution.executedPlan.toString
    val valueWindows = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition(__v"))
    valueWindows.foreach(l => assert(l.contains("__bk"),
      s"value-row window must be bucket-partitioned: $l"))
  }

  test("groups are independent; shifted group flags, stable group does not") {
    val a = (Seq.fill(20)(("s", 0)) ++ Seq.fill(20)(("m", 0))).toDF("grp", "bk")
    val b = (Seq.fill(20)(("s", 0)) ++ Seq.fill(20)(("m", 5))).toDF("grp", "bk")
    val out = Drift.psi(a, b, Seq("grp"), "bk")
      .select("grp", "psi").as[(String, Double)].collect().toMap
    assert(out("s") == 0.0 && out("m") > 0.25)
  }

  test("Mann-Whitney U: hand-computed ranks, ties averaged") {
    // A = {1,2,3}, B = {2,3,4}: sorted 1,2,2,3,3,4 with avg ranks
    // 1, 2.5, 2.5, 4.5, 4.5, 6 → R_A = 1+2.5+4.5 = 8, U_A = 8-6 = 2,
    // U_B = 9-2 = 7, tie_sum = 0+6+6+0 = 12
    val a = Seq(1.0, 2.0, 3.0).toDF("v").repartition(2)
    val b = Seq(2.0, 3.0, 4.0).toDF("v").repartition(2)
    val r = Drift.mannWhitney(a, b, "v", v => floor(v / 2.0)).head()
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("r_a") == 8.0)
    assert(r.getAs[Double]("u_a") == 2.0)
    assert(r.getAs[Double]("u_b") == 7.0)
    assert(r.getAs[Double]("tie_sum") == 12.0)
    // z replayed with the identical IEEE op sequence
    val (na, nb, nn, tie) = (3.0, 3.0, 6.0, 12.0)
    val varU = (na * nb / 12.0) * ((nn + 1.0) - tie / (nn * (nn - 1.0)))
    val z = BigDecimal((2.0 - na * nb / 2.0) / math.sqrt(varU))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") == z)
  }

  test("Mann-Whitney U: identical samples give U_A = U_B, z = 0") {
    val a = Seq(1.0, 2.0, 5.0, 9.0).toDF("v")
    val r = Drift.mannWhitney(a, a, "v", v => floor(v / 4.0)).head()
    assert(r.getAs[Double]("u_a") == 8.0 && r.getAs[Double]("u_b") == 8.0)
    assert(r.getAs[Double]("z") == 0.0)
  }

  test("Mann-Whitney U: degenerate inputs fail loudly") {
    val a = Seq(1.0, 2.0).toDF("v")
    val empty = Seq.empty[Double].toDF("v")
    val ex = intercept[Exception] {
      Drift.mannWhitney(a, empty, "v", v => floor(v)).collect()
    }
    val m1 = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(m1.contains("empty sample"))

    val tied = Seq(5.0, 5.0, 5.0).toDF("v")
    val ex2 = intercept[Exception] {
      Drift.mannWhitney(tied, tied, "v", v => floor(v)).collect()
    }
    val m2 = ex2.getMessage + Option(ex2.getCause).map(_.getMessage).getOrElse("")
    assert(m2.contains("zero rank variance"))
  }

  test("propZTest hand-computed: 30/100 vs 20/100 under the pooled SE") {
    import spark.implicits._
    val rows = (1 to 100).map(i => ("A", i <= 30)) ++
      (1 to 100).map(i => ("B", i <= 20))
    val df = rows.toDF("arm", "ok")
    val r = Drift.propZTest(df, "arm", "A", "B", "ok").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((100L, 100L, 30L, 20L)))
    val pool = 0.25
    val want = BigDecimal((0.3 - 0.2) /
      math.sqrt(pool * (1 - pool) * (1.0 / 100 + 1.0 / 100)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(6) - want) < 1e-12,
      s"z ${r.getDouble(6)} vs $want")
  }

  test("kruskalWallis hand-computed: untied and tied textbook cases") {
    import spark.implicits._
    // A=[1,2], B=[3,4]: ranks 1..4, R_A=3, R_B=7,
    // H = 12/(4*5) * (9/2 + 49/2) - 3*5 = 2.4, no ties
    val ut = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val r1 = Drift.kruskalWallis(ut, "g", "v", identity).collect().head
    assert((r1.getLong(0), r1.getLong(1)) == ((4L, 2L)))
    assert(math.abs(r1.getDouble(2) - 2.4) < 1e-12, r1.toString)
    // eta2_h = (H - k + 1)/(n - k) = 1.4/2
    assert(math.abs(r1.getAs[Double]("eta2_h") - 0.7) < 1e-12, r1.toString)
    // A=[1,1], B=[2,2]: avg ranks 1.5/3.5, H0 = 2.4,
    // tie = 2*(8-2) = 12, C = 1 - 12/60 = 0.8, H = 3.0
    val tied = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val r2 = Drift.kruskalWallis(tied, "g", "v", identity).collect().head
    assert(math.abs(r2.getDouble(2) - 3.0) < 1e-12, r2.toString)
  }

  test("kruskalWallis raises on one group and on all-tied values") {
    import spark.implicits._
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val e1 = intercept[Exception] {
      Drift.kruskalWallis(one, "g", "v", identity).collect()
    }
    assert(e1.getMessage.contains("at least 2 groups"), e1.getMessage)
    val allTied = Seq(("A", 5.0), ("B", 5.0), ("B", 5.0)).toDF("g", "v")
    val e2 = intercept[Exception] {
      Drift.kruskalWallis(allTied, "g", "v", identity).collect()
    }
    assert(e2.getMessage.contains("every value tied"), e2.getMessage)
  }

  test("anovaF hand-computed: SSB=6, SSW=10, F=2.4 on two 3-row groups") {
    import spark.implicits._
    // A=[1,2,3], B=[2,4,6] money: T=600000c², SSB=60000c²=6,
    // SSW=100000c²=10, F=(6/1)/(10/4)=2.4
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 4.0), ("B", 6.0)).toDF("g", "v")
    val r = Drift.anovaF(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((6L, 2L)))
    assert(math.abs(r.getDouble(2) - 6.0) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(3) - 10.0) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(4) - 2.4) < 1e-12, r.toString)
    // eta2 = 6/(6+10)
    assert(math.abs(r.getAs[Double]("eta2") - 0.375) < 1e-12, r.toString)
  }

  test("anovaF raises on one group and on zero within-group variance") {
    import spark.implicits._
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val e1 = intercept[Exception] {
      Drift.anovaF(one, "g", "v").collect()
    }
    assert(e1.getMessage.contains("at least 2 groups"), e1.getMessage)
    val flat = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val e2 = intercept[Exception] {
      Drift.anovaF(flat, "g", "v").collect()
    }
    assert(e2.getMessage.contains("zero within-group"), e2.getMessage)
  }

  test("jonckheereTerpstra: 2-group case equals Mann–Whitney z; ties " +
      "split and correct the variance") {
    import spark.implicits._
    // A=[1,2] < B=[3,4]: J = 4, mu = 2, sigma = sqrt(5/3) -> the MW z
    val two = Seq(("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0))
      .toDF("g", "v")
    val r = Drift.jonckheereTerpstra(two, "g", "v", Seq("A", "B"),
      identity).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 2L)), r.toString)
    assert(r.getAs[Double]("j") == 4.0, r.toString)
    assert(math.abs(r.getAs[Double]("z") -
      2.0 / math.sqrt(5.0 / 3.0)) < 1e-12, r.toString)
    // A=[1,1], B=[2], C=[2,3]: J = 2 + 4 + 1.5 = 7.5 (the B/C tie
    // contributes a half); tie groups at BOTH v=1 (A's pair) and v=2:
    // A = 300−36−36 = 228, B = 0, C = 4·4 = 16 -> z = 14/sqrt(16 sigma2)
    val three = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("C", 2.0),
      ("C", 3.0)).toDF("g", "v")
    val r3 = Drift.jonckheereTerpstra(three, "g", "v",
      Seq("A", "B", "C"), identity).collect().head
    assert(r3.getAs[Double]("j") == 7.5, r3.toString)
    val sig2x4 = 228.0 / 18.0 + 16.0 / 40.0
    assert(math.abs(r3.getAs[Double]("z") -
      14.0 / math.sqrt(4.0 * sig2x4)) < 1e-12, r3.toString)
  }

  test("jonckheereTerpstra raises on unmapped groups and tied-flat " +
      "input; is bucket-invariant") {
    import spark.implicits._
    val three = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("C", 2.0),
      ("C", 3.0)).toDF("g", "v")
    val zb = Drift.jonckheereTerpstra(three, "g", "v",
        Seq("A", "B", "C"), v => floor(v / 2.0))
      .collect().head.getAs[Double]("z")
    val zi = Drift.jonckheereTerpstra(three, "g", "v",
        Seq("A", "B", "C"), identity)
      .collect().head.getAs[Double]("z")
    assert(zb == zi, s"$zb vs $zi")
    val e1 = intercept[Exception] {
      Drift.jonckheereTerpstra(three, "g", "v", Seq("A", "B"),
        identity).collect()
    }
    assert(e1.getMessage.contains("not in groupOrder"), e1.getMessage)
    val flat = Seq(("A", 5.0), ("A", 5.0), ("B", 5.0)).toDF("g", "v")
    val e2 = intercept[Exception] {
      Drift.jonckheereTerpstra(flat, "g", "v", Seq("A", "B"),
        identity).collect()
    }
    assert(e2.getMessage.contains("zero null variance"), e2.getMessage)
  }

  test("leveneBF hand-computed: interpolated and odd medians, W=1.1607…") {
    import spark.implicits._
    // A=[1,2,3,10]: med2=200+300 (interpolated 2.50), z=|2v−500| =
    // [300,100,100,1500]; B=[5,5,6]: med2=500+500 (odd n doubles the
    // central value), z=[0,0,200]. t = 2000²/4 + 200²/3; ssb_h =
    // t − 2200²/7; ssw_h = 2400000 − t; W = ssb/(ssw/5) = 1.160714…
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0),
      ("B", 5.0), ("B", 5.0), ("B", 6.0)).toDF("g", "v")
    val r = Drift.leveneBF(df, "g", "v", v => floor(v / 200.0))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((7L, 2L)))
    assert(math.abs(r.getAs[Double]("ss_between") - 8.047619047619048)
      < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("ss_within") - 34.666666666666667)
      < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("w") - 1.1607142857142858) < 1e-12,
      r.toString)
  }

  test("leveneBF is bucket-invariant and raises loudly on degenerates") {
    import spark.implicits._
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0),
      ("B", 5.0), ("B", 5.0), ("B", 6.0)).toDF("g", "v")
    // the bucket only partitions the median two-phase — any monotone
    // bucketing (including the degenerate single bucket) must agree
    val w1 = Drift.leveneBF(df, "g", "v", _ => lit(0L))
      .collect().head.getAs[Double]("w")
    val w2 = Drift.leveneBF(df, "g", "v", v => floor(v / 200.0))
      .collect().head.getAs[Double]("w")
    assert(w1 == w2, s"$w1 vs $w2")
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    val e1 = intercept[Exception] {
      Drift.leveneBF(one, "g", "v", identity).collect()
    }
    assert(e1.getMessage.contains("at least 2 groups"), e1.getMessage)
    // every value equals its group median ⇒ all deviations 0 ⇒ W 0/0
    val flat = Seq(("A", 1.0), ("A", 1.0), ("B", 2.0), ("B", 2.0))
      .toDF("g", "v")
    val e2 = intercept[Exception] {
      Drift.leveneBF(flat, "g", "v", identity).collect()
    }
    assert(e2.getMessage.contains("zero within-group deviation"),
      e2.getMessage)
  }

  test("cliffsDelta hand-computed: a=[1,2,3] vs b=[2,3,4] gives -5/9") {
    import spark.implicits._
    // #(a>b)=1, #(a<b)=6, ties=2: U_a = 1 + 0.5*2 = 2,
    // delta = (2*2 - 9)/9 = -5/9
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val b = Seq(2.0, 3.0, 4.0).toDF("v")
    val r = Drift.cliffsDelta(a, b, "v", identity).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) === 2.0, r.toString)
    assert(math.abs(r.getDouble(3) - (-5.0 / 9.0)) < 1e-15, r.toString)
    val e = intercept[Exception] {
      Drift.cliffsDelta(a.filter(col("v") < 0), b, "v", identity)
        .collect()
    }
    assert(e.getMessage.contains("empty sample"), e.getMessage)
  }

  test("wilcoxonSignedRank hand-computed: zero drops, signed ranks, " +
      "tie-averaged z = 0 on a symmetric pair") {
    import spark.implicits._
    // d = [+1, -2, +3, 0] dollars → cents [100, -200, 300, drop]:
    // ranks 1, 2, 3; W+ = 1 + 3 = 4; mean = 3; var = 3.5
    val df = Seq((2.0, 1.0), (1.0, 3.0), (5.0, 2.0), (4.0, 4.0))
      .toDF("x", "y")
    val r = Drift.wilcoxonSignedRank(df, "x", "y", identity)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 1L)))
    assert(r.getDouble(2) === 4.0, r.toString)
    assert(math.abs(r.getDouble(3) - 1.0 / math.sqrt(3.5)) < 1e-12,
      r.toString)
    // rank-biserial r = (2W+ - S)/S = (8 - 6)/6
    assert(math.abs(r.getAs[Double]("r_rb") - 1.0 / 3.0) < 1e-12,
      r.toString)
    // +1 and -1: tied |d|, averaged rank 1.5 each, W+ = mean → z = 0
    val sym = Seq((2.0, 1.0), (1.0, 2.0)).toDF("x", "y")
    val rs = Drift.wilcoxonSignedRank(sym, "x", "y", identity)
      .collect().head
    assert(rs.getDouble(2) === 1.5 && rs.getDouble(3) === 0.0,
      rs.toString)
    assert(rs.getAs[Double]("r_rb") === 0.0, rs.toString)
  }

  test("wilcoxonSignedRank raises when every pair is tied") {
    import spark.implicits._
    val flat = Seq((1.0, 1.0), (2.0, 2.0)).toDF("x", "y")
    val e = intercept[Exception] {
      Drift.wilcoxonSignedRank(flat, "x", "y", identity).collect()
    }
    assert(e.getMessage.contains("every pair tied"), e.getMessage)
  }

  test("friedman hand-computed: n=2 blocks, k=3, no ties") {
    import spark.implicits._
    // b1: A=1 B=2 C=3 -> ranks 1,2,3; b2: A=2 B=1 C=3 -> ranks 2,1,3
    // R_A=3 R_B=3 R_C=6; chi2 = 12/(2*3*4)*54 - 3*2*4 = 27 - 24 = 3
    val df = Seq(("b1", "A", 1.0), ("b1", "B", 2.0), ("b1", "C", 3.0),
      ("b2", "A", 2.0), ("b2", "B", 1.0), ("b2", "C", 3.0))
      .toDF("blk", "trt", "v")
    val r = Drift.friedman(df, "blk", "trt", "v", 3).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 3L)), r.toString)
    assert(r.getDouble(2) === 3.0, r.toString)
  }

  test("friedman tie correction: a within-block tie shrinks the " +
      "denominator; an incomplete block drops and n reports it") {
    import spark.implicits._
    // b1: A=1 B=1 C=2 (tie) -> rank2 (3,3,6); b2: A=1 B=2 C=3 ->
    // (2,4,6). Sum(2R)^2 = 25+49+144 = 218 -> chi0 = 3*218/24 - 24 =
    // 3.25; tie = (4-1)+(4-1) = 6 -> corr = 1 - 6/48 = 0.875 ->
    // chi2_f = 26/7. b3 carries only {A,B} and must DROP.
    val df = Seq(("b1", "A", 1.0), ("b1", "B", 1.0), ("b1", "C", 2.0),
      ("b2", "A", 1.0), ("b2", "B", 2.0), ("b2", "C", 3.0),
      ("b3", "A", 9.0), ("b3", "B", 8.0))
      .toDF("blk", "trt", "v")
    val r = Drift.friedman(df, "blk", "trt", "v", 3).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 3L)), r.toString)
    assert(math.abs(r.getDouble(2) - 26.0 / 7.0) < 1e-12, r.toString)
  }

  test("friedman loud degenerates: duplicate cell, no complete " +
      "blocks, disagreeing treatment sets, every block tied") {
    import spark.implicits._
    val dup = Seq(("b1", "A", 1.0), ("b1", "A", 2.0), ("b1", "B", 3.0))
      .toDF("blk", "trt", "v")
    val e1 = intercept[Exception] {
      Drift.friedman(dup, "blk", "trt", "v", 2).collect()
    }
    assert(e1.getMessage.contains("duplicate (block, treatment)"),
      e1.getMessage)
    val sparse = Seq(("b1", "A", 1.0), ("b2", "B", 2.0))
      .toDF("blk", "trt", "v")
    val e2 = intercept[Exception] {
      Drift.friedman(sparse, "blk", "trt", "v", 2).collect()
    }
    assert(e2.getMessage.contains("no complete blocks"), e2.getMessage)
    // b1 = {A,B}, b2 = {B,C}: each complete at k=2 but the union is 3
    val mixed = Seq(("b1", "A", 1.0), ("b1", "B", 2.0),
      ("b2", "B", 1.0), ("b2", "C", 2.0)).toDF("blk", "trt", "v")
    val e3 = intercept[Exception] {
      Drift.friedman(mixed, "blk", "trt", "v", 2).collect()
    }
    assert(e3.getMessage.contains("disagree on the treatment set"),
      e3.getMessage)
    val flat = Seq(("b1", "A", 1.0), ("b1", "B", 1.0),
      ("b2", "A", 2.0), ("b2", "B", 2.0)).toDF("blk", "trt", "v")
    val e4 = intercept[Exception] {
      Drift.friedman(flat, "blk", "trt", "v", 2).collect()
    }
    assert(e4.getMessage.contains("internally tied"), e4.getMessage)
  }

  test("propZTest raises on an empty arm and on a degenerate pooled " +
      "rate; null success flags drop their rows") {
    import spark.implicits._
    val oneArm = Seq(("A", true), ("A", false)).toDF("arm", "ok")
    val e1 = intercept[Exception] {
      Drift.propZTest(oneArm, "arm", "A", "B", "ok").collect()
    }
    assert(e1.getMessage.contains("empty arm"), e1.getMessage)
    val allFail = Seq(("A", false), ("B", false)).toDF("arm", "ok")
    val e2 = intercept[Exception] {
      Drift.propZTest(allFail, "arm", "A", "B", "ok").collect()
    }
    assert(e2.getMessage.contains("0 or 1"), e2.getMessage)
    val withNull = Seq(("A", Some(true)), ("A", None), ("A", Some(false)),
      ("B", Some(true)), ("B", Some(false))).toDF("arm", "ok")
    val r = Drift.propZTest(withNull, "arm", "A", "B", "ok")
      .collect().head
    assert(r.getLong(0) == 2L && r.getLong(2) == 1L)
  }

  test("benjaminiHochberg: textbook step-up, tie handling, none-pass") {
    import spark.implicits._
    // thresholds k*0.05/10: largest k with p_(k) <= k*0.005 is k=2
    val ps = Seq(0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074,
      0.205, 0.212, 0.216)
    val df = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "p")
    val r = Drift.benjaminiHochberg(df, "p").collect()
      .map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r(0L) && r(1L) && !r(2L) && !r(3L) && !r(9L), r.toString)
    // tied p share their HIGHEST rank: both 0.01 <= 2*0.05/4
    val tied = Seq((0L, 0.01), (1L, 0.01), (2L, 0.04), (3L, 0.9))
      .toDF("id", "p")
    val rt = Drift.benjaminiHochberg(tied, "p").collect()
      .map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(rt(0L) && rt(1L) && !rt(2L) && !rt(3L), rt.toString)
    // nothing clears the rule: all false, no crash on the null cutoff
    val none = Seq((0L, 0.9), (1L, 0.8)).toDF("id", "p")
    assert(Drift.benjaminiHochberg(none, "p").collect()
      .forall(!_.getBoolean(2)))
  }

  test("benjaminiHochberg grouped: families correct independently") {
    import spark.implicits._
    // family A: m=2, 0.02 <= 1*0.05/2 -> rejected; family B: the SAME
    // p=0.02 among 10 hypotheses fails 1*0.05/10 = 0.005 -> kept
    val df = (Seq(("A", 0L, 0.02), ("A", 1L, 0.9)) ++
      (2L to 11L).map(i => ("B", i, if (i == 2L) 0.02 else 0.9)))
      .toDF("fam", "id", "p")
    val r = Drift.benjaminiHochberg(df, "p", groupCols = Seq("fam"))
      .collect().map(x => x.getLong(1) -> x.getBoolean(3)).toMap
    assert(r(0L) && !r(1L) && !r(2L) && !r(5L), r.toString)
  }

  test("benjaminiHochberg raises on NULL p and p outside [0,1]") {
    import spark.implicits._
    val withNull = Seq((0L, Some(0.1)), (1L, None)).toDF("id", "p")
    val e1 = intercept[Exception] {
      Drift.benjaminiHochberg(withNull, "p").collect()
    }
    assert(e1.getMessage.contains("NULL p-value"), e1.getMessage)
    val bad = Seq((0L, 0.1), (1L, 1.5)).toDF("id", "p")
    val e2 = intercept[Exception] {
      Drift.benjaminiHochberg(bad, "p").collect()
    }
    assert(e2.getMessage.contains("outside [0,1]"), e2.getMessage)
  }

  test("cochranArmitage: hand-computed 3-stratum trend; degenerates " +
      "raise") {
    import spark.implicits._
    // strata A/B/C (scores 0/1/2), 10 trials each, 2/5/8 successes:
    // N=30, R=15, S1=30, S2=50, T1=21 ->
    // z = (30*21 - 15*30) * sqrt(30) / sqrt(15*15*(30*50 - 900))
    val rows = Seq.tabulate(10)(i => ("A", i < 2)) ++
      Seq.tabulate(10)(i => ("B", i < 5)) ++
      Seq.tabulate(10)(i => ("C", i < 8))
    val got = Drift.cochranArmitage(rows.toDF("g", "ok"), "g", "ok",
      Seq("A", "B", "C")).collect().head
    assert(got.getLong(0) == 30 && got.getLong(1) == 3 &&
      got.getLong(2) == 15, got.toString)
    val expected = 180.0 * math.sqrt(30.0) / math.sqrt(135000.0)
    assert(math.abs(got.getDouble(3) - expected) < 1e-12, got.toString)
    // reversing the order flips the sign exactly
    val rev = Drift.cochranArmitage(rows.toDF("g", "ok"), "g", "ok",
      Seq("C", "B", "A")).collect().head
    assert(math.abs(rev.getDouble(3) + expected) < 1e-12, rev.toString)
    val e1 = intercept[Exception] {
      Drift.cochranArmitage(rows.toDF("g", "ok"), "g", "ok",
        Seq("A", "B")).collect()
    }
    assert(e1.getMessage.contains("not in strataOrder"), e1.getMessage)
    val flat = Seq(("A", true), ("B", true)).toDF("g", "ok")
    val e2 = intercept[Exception] {
      Drift.cochranArmitage(flat, "g", "ok", Seq("A", "B")).collect()
    }
    assert(e2.getMessage.contains("all-success"), e2.getMessage)
    val one = Seq(("A", true), ("A", false)).toDF("g", "ok")
    val e3 = intercept[Exception] {
      Drift.cochranArmitage(one, "g", "ok", Seq("A", "B")).collect()
    }
    assert(e3.getMessage.contains("at least 2 strata"), e3.getMessage)
  }

  test("pageTrend: perfect 2-block monotone trend gives z = 2 " +
      "exactly; reversed order flips the sign; degenerates raise") {
    import spark.implicits._
    // blocks b1/b2, treatments A<B<C with strictly rising values:
    // ranks 1,2,3 per block -> L = 1*2 + 2*4 + 3*6 = 28 (the max),
    // E[L] = 2*3*16/4 = 24, Var[L] = 2*9*16*2/144 = 4 -> z = 4/2
    val rows = Seq(("b1", "A", 10), ("b1", "B", 20), ("b1", "C", 30),
      ("b2", "A", 1), ("b2", "B", 2), ("b2", "C", 3))
    val got = Drift.pageTrend(rows.toDF("b", "t", "v"), "b", "t", "v",
      Seq("A", "B", "C")).collect().head
    assert(got.getLong(0) == 2 && got.getLong(1) == 3, got.toString)
    assert(got.getDouble(2) == 28.0, got.toString)
    assert(got.getDouble(3) == 2.0, got.toString)
    val rev = Drift.pageTrend(rows.toDF("b", "t", "v"), "b", "t", "v",
      Seq("C", "B", "A")).collect().head
    assert(rev.getDouble(3) == -2.0, rev.toString)
    // an incomplete block drops (the friedman rule); one complete
    // block remains
    val partial = rows ++ Seq(("b3", "A", 5))
    val p = Drift.pageTrend(partial.toDF("b", "t", "v"), "b", "t", "v",
      Seq("A", "B", "C")).collect().head
    assert(p.getLong(0) == 2, p.toString)
    // a kept (complete-size) block carrying an unmapped treatment
    // raises — silent drop would bias L
    val unmapped = Seq(("b1", "A", 1), ("b1", "X", 2))
    val e1 = intercept[Exception] {
      Drift.pageTrend(unmapped.toDF("b", "t", "v"), "b", "t", "v",
        Seq("A", "B")).collect()
    }
    assert(e1.getMessage.contains("not in treatmentOrder"),
      e1.getMessage)
    val e2 = intercept[Exception] {
      Drift.pageTrend(Seq(("b1", "A", 1)).toDF("b", "t", "v"),
        "b", "t", "v", Seq("A", "B", "C")).collect()
    }
    assert(e2.getMessage.contains("no complete blocks"), e2.getMessage)
  }

  test("kendallW: perfect agreement gives W = 1; chi2_F = b(k-1)W " +
      "differential against friedman; degenerates raise") {
    import spark.implicits._
    // identical rankings in both blocks -> W = 1 exactly
    val perfect = Seq(("b1", "A", 1), ("b1", "B", 2), ("b1", "C", 3),
      ("b2", "A", 10), ("b2", "B", 20), ("b2", "C", 30))
      .toDF("b", "t", "v")
    val w1 = Drift.kendallW(perfect, "b", "t", "v", 3).collect().head
    assert(w1.getLong(0) == 2 && w1.getLong(1) == 3, w1.toString)
    assert(w1.getDouble(2) == 1.0, w1.toString)
    // mixed rankings with a tie: chi2_F must equal b(k-1)W on the
    // same cells (the identity only bends under ties in chi2's own
    // tie correction, so compare on a TIE-FREE fixture)
    val mixed = Seq(("b1", "A", 3), ("b1", "B", 1), ("b1", "C", 2),
      ("b2", "A", 1), ("b2", "B", 2), ("b2", "C", 3),
      ("b3", "A", 2), ("b3", "B", 1), ("b3", "C", 3))
      .toDF("b", "t", "v")
    val w = Drift.kendallW(mixed, "b", "t", "v", 3).collect()
      .head.getDouble(2)
    val chi = Drift.friedman(mixed, "b", "t", "v", 3).collect()
      .head.getAs[Double]("chi2_f")
    assert(math.abs(chi - 3.0 * (3 - 1) * w) < 1e-12, s"chi $chi w $w")
    // every block fully tied -> denominator 0 raises
    val tied = Seq(("b1", "A", 1), ("b1", "B", 1), ("b1", "C", 1))
      .toDF("b", "t", "v")
    val e = intercept[Exception] {
      Drift.kendallW(tied, "b", "t", "v", 3).collect()
    }
    assert(e.getMessage.contains("fully tied"), e.getMessage)
  }

  test("kendallW raises when k-sized blocks come from DIFFERENT " +
      "treatment label sets (silently invalid W pre-fix)") {
    import spark.implicits._
    // both blocks have exactly 3 distinct treatments so both pass
    // blockRanks' per-block filter, but the sets differ — the
    // per-treatment block counts are 1/2/2/1 and b = max would lie
    val mixed = Seq(("b1", "A", 1), ("b1", "B", 2), ("b1", "C", 3),
      ("b2", "B", 1), ("b2", "C", 2), ("b2", "D", 3))
      .toDF("b", "t", "v")
    val e = intercept[Exception] {
      Drift.kendallW(mixed, "b", "t", "v", 3).collect()
    }
    assert(e.getMessage.contains("disagree on the treatment set"),
      e.getMessage)
  }
}
