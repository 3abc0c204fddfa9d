package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier hand curve: censoring shrinks risk sets without " +
      "events; an exhausted final risk set lands exactly 0") {
    // t=1 event, t=2 censored, t=3 two events, t=4 censored, t=5 event:
    // S = 5/6 at 1, (5/6)(1-2/4) = 5/12 at 3, 0 at 5 (d = n)
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(subj, "dur", "ev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 6L, 1L, 0L, 0.833333),
      (3L, 4L, 2L, 0L, 0.416667), (5L, 1L, 1L, 0L, 0.0)), got.toString)
  }

  test("nelsonAalen hand curve: H cumulates d/n over the same grid") {
    val subj = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (4L, false), (5L, true)).toDF("dur", "ev")
    val got = Survival.nelsonAalen(subj, "dur", "ev").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) ==
      Seq((1L, 6L, 1L), (3L, 4L, 2L), (5L, 1L, 1L)), got.toString)
    val hs = got.map(_._4)
    assert(math.abs(hs(0) - 1.0 / 6.0) < 1e-12, hs.toString)
    assert(math.abs(hs(1) - (1.0 / 6.0 + 0.5)) < 1e-12, hs.toString)
    assert(math.abs(hs(2) - (1.0 / 6.0 + 0.5 + 1.0)) < 1e-12,
      hs.toString)
  }

  test("logRank hand-computed: chi2 = 25/17 on the 2x2 staggered " +
      "cohorts; degenerates raise") {
    val subj = Seq(("A", 1L, true), ("A", 2L, true),
      ("B", 2L, true), ("B", 3L, true)).toDF("g", "dur", "ev")
    val r = Survival.logRank(subj, "dur", "ev", "g").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)), r.toString)
    assert(r.getAs[Double]("o_a") == 2.0, r.toString)
    assert(math.abs(r.getAs[Double]("e_a") - 7.0 / 6.0) < 1e-12,
      r.toString)
    assert(math.abs(r.getAs[Double]("chi2") - 25.0 / 17.0) < 1e-12,
      r.toString)
    val three = Seq(("A", 1L, true), ("B", 2L, true), ("C", 3L, true))
      .toDF("g", "dur", "ev")
    val e1 = intercept[Exception] {
      Survival.logRank(three, "dur", "ev", "g").collect()
    }
    assert(e1.getMessage.contains("exactly 2 groups"), e1.getMessage)
    val nullEv = Seq(("A", 1L, Some(true)), ("B", 2L, None))
      .toDF("g", "dur", "ev")
    val e2 = intercept[Exception] {
      Survival.logRank(nullEv, "dur", "ev", "g").collect()
    }
    assert(e2.getMessage.contains("NULL event flag"), e2.getMessage)
    val neg = Seq((-1L, true), (2L, true)).toDF("dur", "ev")
    val e3 = intercept[Exception] {
      Survival.kaplanMeier(neg, "dur", "ev").collect()
    }
    assert(e3.getMessage.contains("negative duration"), e3.getMessage)
  }
}
