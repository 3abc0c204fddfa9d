package graft.operators

import graft.SparkSpec

/** Calibration-report mechanics on crafted score distributions (the
  * driver gate runs real classifier scores, which cluster near 0.5 —
  * this covers the full bin range and the closed-form arithmetic). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("calibration: bins, counts, conf/acc/gap are the closed form") {
    // two scores per bin, label = true for the first of each pair
    val rows = (0 until 10).flatMap { b =>
      val lo = b / 10.0 + 0.02
      val hi = b / 10.0 + 0.06
      Seq((lo, true), (hi, false))
    }
    val got = Classifier.calibration(
        rows.toDF("score", "label"), "score", "label")
      .orderBy("bin").collect()
    assert(got.length == 10)
    got.zipWithIndex.foreach { case (r, b) =>
      assert(r.getInt(0) == b && r.getLong(1) == 2 && r.getLong(2) == 1)
      val conf = (b / 10.0 + 0.02 + b / 10.0 + 0.06) / 2
      assert(math.abs(r.getDouble(3) - conf) < 1e-9, s"bin $b conf")
      assert(r.getDouble(4) == 0.5)
      assert(math.abs(r.getDouble(5) -
        math.abs(r.getDouble(3) - 0.5)) < 1e-15)
    }
  }

  test("calibration: out-of-range scores fail loudly") {
    val bad = Seq((1.2, true)).toDF("score", "label")
    val ex = intercept[Exception] {
      Classifier.calibration(bad, "score", "label").collect()
    }
    assert(ex.getMessage.contains("out of [0,1]"))
  }

  test("calibration: score 1.0 lands in the top bin (clamp), ECE of a " +
      "perfectly calibrated set is 0") {
    val one = Seq((1.0, true)).toDF("score", "label")
    assert(Classifier.calibration(one, "score", "label")
      .collect().head.getInt(0) == 9)
    // bin 0.25: conf 0.25, acc 1/4 -> gap 0 exactly (decimal sum)
    val cal = Seq((0.25, true), (0.25, false), (0.25, false),
      (0.25, false)).toDF("score", "label")
    val r = Classifier.calibration(cal, "score", "label").collect().head
    assert(r.getDouble(5) == 0.0, s"gap must be exactly 0: $r")
  }
}
