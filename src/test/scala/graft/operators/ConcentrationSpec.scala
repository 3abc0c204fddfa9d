package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Concentration.gini]] / [[Concentration.topShare]] against
  * driver-side references, closed-form extremes, bucket invariance,
  * and the loud guards. */
class ConcentrationSpec extends SparkSpec {
  import spark.implicits._

  private def refGini(xs: Seq[Double]): Double = {
    val v = xs.map(x => math.floor(x * 100 + 0.5).toLong).sorted
    val n = v.length
    val num = v.zipWithIndex.map { case (x, i0) =>
      BigInt(x) * (2L * (i0 + 1) - n - 1) }.sum
    val sv = v.map(BigInt(_)).sum
    num.toDouble / (BigInt(n) * sv).toDouble
  }

  test("matches the driver-side reference on random 2-dp values") {
    val rng = new scala.util.Random(3)
    val xs = Seq.fill(700)(math.floor(rng.nextDouble() * 50000) / 100.0)
      .map(_ + 1.0) // keep strictly positive
    val got = Concentration.gini(xs.map(Tuple1(_)).toDF("v"), "v",
      c => c / lit(100000L)).collect().head
    assert(got.getLong(0) == 700)
    assert(got.getDouble(2) == refGini(xs))
    // bucket granularity must not change the result
    val alt = Concentration.gini(xs.map(Tuple1(_)).toDF("v"), "v",
      c => c / lit(7777L)).collect().head
    assert(alt.getDouble(2) == got.getDouble(2))
  }

  test("closed-form extremes: uniform mass → 0, one holder → (n−1)/n") {
    val flat = Seq.fill(40)(25.0)
    val g0 = Concentration.gini(flat.map(Tuple1(_)).toDF("v"), "v",
      c => c / lit(100L)).collect().head.getDouble(2)
    assert(g0 == 0.0)
    val spike = Seq.fill(39)(0.0) :+ 1000.0
    val g1 = Concentration.gini(spike.map(Tuple1(_)).toDF("v"), "v",
      c => c / lit(100L)).collect().head.getDouble(2)
    assert(g1 == 39.0 / 40.0)
  }

  test("topShare matches a descending-sort reference, ties split exactly") {
    val rng = new scala.util.Random(9)
    // heavy ties: only 20 distinct values across 500 rows
    val xs = Seq.fill(500)((rng.nextInt(20) + 1) * 10.0)
    val got = Concentration.topShare(xs.map(Tuple1(_)).toDF("v"), "v",
        Seq(0.1, 0.5), c => c / lit(500L))
      .collect().map(r => r.getDouble(0) -> r).toMap
    val v = xs.map(x => math.floor(x * 100 + 0.5).toLong)
      .sorted(Ordering[Long].reverse)
    val sv = v.map(BigInt(_)).sum
    for (p <- Seq(0.1, 0.5)) {
      val q = BigDecimal((1.0 - p).toString)
      val cut = v.length - math.max(1L,
        (q * v.length).setScale(0, BigDecimal.RoundingMode.CEILING).toLong)
      val share = v.take(cut.toInt).map(BigInt(_)).sum.toDouble / sv.toDouble
      assert(got(p).getLong(1) == cut, s"cut p=$p")
      assert(got(p).getDouble(2) == share, s"share p=$p")
    }
  }

  test("degenerate inputs raise loudly") {
    val e1 = intercept[Exception] {
      Concentration.gini(Seq.empty[Double].map(Tuple1(_)).toDF("v"),
        "v", c => c / lit(100L)).collect()
    }
    assert(e1.getMessage.contains("positive total mass"))
    val e2 = intercept[Exception] {
      Concentration.gini(Seq(5.0, -1.0).map(Tuple1(_)).toDF("v"),
        "v", c => c / lit(100L)).collect()
    }
    assert(e2.getMessage.contains("negative"))
    val e3 = intercept[Exception] {
      Concentration.topShare(Seq(0.0, 0.0).map(Tuple1(_)).toDF("v"),
        "v", Seq(0.5), c => c / lit(100L)).collect()
    }
    assert(e3.getMessage.contains("positive total mass"))
  }
}
