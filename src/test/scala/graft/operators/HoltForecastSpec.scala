package graft.operators

import graft.SparkSpec

/** [[TimeSeries.holtForecast]] against a driver-side fold, closed-form
  * behaviors on constant and linear series, and the loud guards. */
class HoltForecastSpec extends SparkSpec {
  import spark.implicits._

  private def ref(xs: Seq[Double], a: Double, b: Double): (Double, Double) =
    xs.tail.foldLeft((xs.head, 0.0)) { case ((l, t), x) =>
      val lN = x * a + (l + t) * (1.0 - a)
      (lN, (lN - l) * b + t * (1.0 - b))
    }

  test("matches the driver-side fold bit-for-bit on a noisy series") {
    val rng = new scala.util.Random(21)
    val xs = (1 to 200).map(i => 100.0 + i * 2 + rng.nextInt(30))
    val df = xs.zipWithIndex.map { case (v, i) =>
      ("k", i.toLong, v) }.toDF("k", "slot", "v")
    val got = TimeSeries.holtForecast(df, "k", "slot", "v",
      alpha = 0.5, beta = 0.25, horizon = 7).collect().head
    val (l, t) = ref(xs.map(_.toDouble), 0.5, 0.25)
    assert(got.getLong(1) == 200)
    assert(got.getDouble(2) == l && got.getDouble(3) == t)
    assert(got.getDouble(4) == l + t)
    assert(got.getDouble(5) == l + 7.0 * t)
  }

  test("constant series: level = the constant, trend = 0, fc = constant") {
    val df = (1 to 50).map(i => ("k", i.toLong, 42.0)).toDF("k", "slot", "v")
    val got = TimeSeries.holtForecast(df, "k", "slot", "v",
      0.5, 0.25, 10).collect().head
    assert(got.getDouble(2) == 42.0 && got.getDouble(3) == 0.0)
    assert(got.getDouble(5) == 42.0)
  }

  test("long linear ramp: forecast converges onto the line") {
    // x_t = 10 + 3t; after burn-in the h-step forecast must sit within
    // a tight band of the true continuation
    val n = 300
    val df = (1 to n).map(i => ("k", i.toLong, 10.0 + 3.0 * i))
      .toDF("k", "slot", "v")
    val got = TimeSeries.holtForecast(df, "k", "slot", "v",
      0.5, 0.25, 5).collect().head
    val truth = 10.0 + 3.0 * (n + 5)
    assert(math.abs(got.getDouble(5) - truth) < 0.5,
      s"fc_h=${got.getDouble(5)} truth=$truth")
    assert(math.abs(got.getDouble(3) - 3.0) < 0.01, "trend ≈ slope")
  }

  test("keys fold independently; slot order, not insertion order") {
    val rows = Seq(("b", 2L, 30.0), ("a", 1L, 1.0), ("b", 1L, 10.0),
      ("a", 2L, 3.0))
    val got = TimeSeries.holtForecast(rows.toDF("k", "slot", "v"),
        "k", "slot", "v", 0.5, 0.25, 1)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // a: l1=1, l2 = 3*.5 + (1+0)*.5 = 2; b: l1=10, l2 = 30*.5+5 = 20
    assert(got("a") == 2.0 && got("b") == 20.0)
  }

  test("duplicate slots raise loudly") {
    val rows = Seq(("k", 1L, 1.0), ("k", 1L, 2.0))
    val e = intercept[Exception] {
      TimeSeries.holtForecast(rows.toDF("k", "slot", "v"),
        "k", "slot", "v", 0.5, 0.25, 1).collect()
    }
    assert(e.getMessage.contains("duplicate slots"))
  }

  test("holtWinters hand-computed: m=2 burn-in, seasonal buffer, " +
      "dyadic exact forecast") {
    import spark.implicits._
    // x = [1..5], alpha=.5 beta=.25 gamma=.5, m=2: t1,t2 burn (l=x,
    // b=0, s=0); t3: l=2.5 b=.125 s=.25; t4: l=3.3125 b=.296875
    // s=.34375; t5: l=4.1796875 b=.439453125 s=.53515625,
    // buf=[.34375,.53515625]
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
      (5L, 5.0)).map { case (s_, v) => ("k", s_, v) }
      .toDF("k", "slot", "v")
    val r = TimeSeries.holtWintersForecast(df, "k", "slot", "v",
      alpha = 0.5, beta = 0.25, gamma = 0.5, period = 2, horizon = 3)
      .collect().head
    assert(r.getAs[Long]("n_slots") == 5L)
    assert(r.getAs[Double]("level") === 4.1796875, r.toString)
    assert(r.getAs[Double]("trend") === 0.439453125, r.toString)
    assert(r.getAs[Double]("fc_1") === 4.962890625, r.toString)
    // h=3: sIdx = ((3-1) % 2) + 1 = 1 -> same seasonal as fc_1
    assert(r.getAs[Double]("fc_h") ===
      4.1796875 + 3.0 * 0.439453125 + 0.34375, r.toString)
  }

  test("holtWinters raises on duplicate slots and on <= m slots") {
    import spark.implicits._
    val dup = Seq(("k", 1L, 1.0), ("k", 1L, 2.0), ("k", 2L, 3.0))
      .toDF("k", "slot", "v")
    val e1 = intercept[Exception] {
      TimeSeries.holtWintersForecast(dup, "k", "slot", "v",
        0.5, 0.25, 0.5, period = 2, horizon = 1).collect()
    }
    assert(e1.getMessage.contains("duplicate slots"), e1.getMessage)
    val short = Seq(("k", 1L, 1.0), ("k", 2L, 2.0))
      .toDF("k", "slot", "v")
    val e2 = intercept[Exception] {
      TimeSeries.holtWintersForecast(short, "k", "slot", "v",
        0.5, 0.25, 0.5, period = 2, horizon = 1).collect()
    }
    assert(e2.getMessage.contains("burn-in"), e2.getMessage)
  }
}
