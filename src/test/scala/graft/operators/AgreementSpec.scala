package graft.operators

import graft.SparkSpec

/** [[Eval.cohenKappa]], [[Graph.assortativity]], and
  * [[Outliers.trimmedMean]] against driver-side references and their
  * closed-form extremes / loud guards. */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

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

  test("assortativity: star is maximally disassortative, chain-end reference") {
    // star K(1,4): every edge pairs degree 4 with degree 1 → after
    // symmetrization x and y are exact mirrors → r = -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val gs = Graph.assortativity(star.toDF("src", "dst"), "src", "dst")
      .collect().head
    assert(gs.getLong(0) == 4 && gs.getDouble(1) == -1.0)
    // path 1-2-3-4: driver-side Pearson over symmetrized degree pairs
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val deg = Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 1.0)
    val xs = path.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val cnt = xs.length
    val sx = xs.map(_._1).sum; val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val refR = (cnt * sxy - sx * sx) / (cnt * sxx - sx * sx)
    val gp = Graph.assortativity(path.toDF("src", "dst"), "src", "dst")
      .collect().head
    assert(math.abs(gp.getDouble(1) - refR) < 1e-12)
  }

  test("assortativity: regular graph (zero variance) raises") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)) // all degree 2
    val e = intercept[Exception] {
      Graph.assortativity(ring.toDF("src", "dst"), "src", "dst")
        .collect()
    }
    assert(e.getMessage.contains("zero degree variance"))
  }

  test("trimmedMean: drops exactly floor(trim*n) per side, ties split") {
    // 10 values, trim 0.2 → k=2: drop {1,2} and {99,100}; mean of the
    // middle six
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 99.0, 100.0)
    val got = Outliers.trimmedMean(xs.map(Tuple1(_)).toDF("v"), "v",
      0.2, c => c / org.apache.spark.sql.functions.lit(100L))
      .collect().head
    assert(got.getLong(0) == 10 && got.getLong(1) == 6)
    assert(got.getDouble(2) == (3.0 + 4 + 5 + 6 + 7 + 8) / 6)
    // heavy ties across the cut boundary: 8 copies of 5 and one 1/9
    val ties = Seq(1.0) ++ Seq.fill(8)(5.0) :+ 9.0
    val gt = Outliers.trimmedMean(ties.map(Tuple1(_)).toDF("v"), "v",
      0.2, c => c / org.apache.spark.sql.functions.lit(100L))
      .collect().head
    // k=2: drop 1 and one 5 low, 9 and one 5 high → six 5s remain
    assert(gt.getLong(1) == 6 && gt.getDouble(2) == 5.0)
  }

  test("trimmedMean: trim = 0 is the plain mean; empty input raises") {
    val xs = Seq(10.0, 20.0, 40.0)
    val got = Outliers.trimmedMean(xs.map(Tuple1(_)).toDF("v"), "v",
      0.0, c => c / org.apache.spark.sql.functions.lit(100L))
      .collect().head
    assert(got.getDouble(2) == 7000.0 / (100.0 * 3))
    // over-trim is UNREACHABLE for trim < 0.5 (2·⌊trim·n⌋ ≤ 2·trim·n
    // < n), so the kept-zero raise is a belt; the reachable loud path
    // is empty input. Extreme-but-legal trim survives with one row:
    val one = Outliers.trimmedMean(
      Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v"), "v", 0.4,
      c => c / org.apache.spark.sql.functions.lit(100L)).collect().head
    assert(one.getLong(1) == 1 && one.getDouble(2) == 2.0)
    val e2 = intercept[Exception] {
      Outliers.trimmedMean(Seq.empty[Double].map(Tuple1(_)).toDF("v"),
        "v", 0.1, c => c / org.apache.spark.sql.functions.lit(100L))
        .collect()
    }
    assert(e2.getMessage.contains("no non-null values"))
  }
}
