package graft.operators

import graft.SparkSpec

/** Closed-form fixtures for [[Regression.linearFit]]: exact lines, a
  * hand-computed non-perfect fit, and partitioning-invariance of the
  * decimal moment sums. */
class RegressionSpec extends SparkSpec {

  import spark.implicits._

  test("perfect line and hand-computed fit, exact to the bit") {
    val df = Seq(
      // group a: y = 2x exactly
      ("a", 1.0, 2.0), ("a", 2.0, 4.0), ("a", 3.0, 6.0),
      // group b: (1,1),(2,3),(3,2) → slope .5, intercept 1, r² .25
      ("b", 1.0, 1.0), ("b", 2.0, 3.0), ("b", 3.0, 2.0)
    ).toDF("g", "x", "y")
    val got = Regression.linearFit(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("a") == ((3L, 2.0, 0.0, 1.0)))
    assert(got("b") == ((3L, 0.5, 1.0, 0.25)))
  }

  test("moment sums are summation-order-independent (decimal, not double)") {
    // values chosen so double summation order WOULD matter: large +
    // tiny 2-dp magnitudes interleaved
    val rows = (1 to 2000).map { i =>
      val x = if (i % 2 == 0) 1e9 + i * 0.01 else 0.01
      ("g", x, 2 * x + 1)
    }
    val one = Regression.linearFit(rows.toDF("g", "x", "y").coalesce(1),
      Seq("g"), "x", "y").collect().head
    val many = Regression.linearFit(
      rows.toDF("g", "x", "y").repartition(17), Seq("g"), "x", "y")
      .collect().head
    assert(one.getDouble(2) == many.getDouble(2))
    assert(one.getDouble(3) == many.getDouble(3))
    assert(one.getDouble(4) == many.getDouble(4))
  }
}
