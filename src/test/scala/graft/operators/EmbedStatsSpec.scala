package graft.operators

import graft.SparkSpec

/** Hand-computed covariance cells + planted-direction recovery for the
  * embedding-matrix statistics (the q_embed_cov / q_embed_pc gates pin
  * determinism vs DuckDB; this spec pins SEMANTICS on constructed
  * geometry). */
class EmbedStatsSpec extends SparkSpec {
  import spark.implicits._

  test("covariance hand case: a perfectly correlated pair gives unit " +
      "covariances at grid 2") {
    // vectors (0,1) and (2,3), grid 2 -> quantized (0,2) and (4,6):
    // every moment clears exactly, cov = 1.0 in all three cells
    val df = Seq(Seq(0.0, 1.0), Seq(2.0, 3.0)).toDF("v")
    val got = EmbedStats.covariance(df, "v", grid = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map((0, 0) -> ((2L, 1.0)), (0, 1) -> ((2L, 1.0)),
      (1, 1) -> ((2L, 1.0))), got.toString)
  }

  test("principalComponent recovers a planted dominant direction") {
    // axis 0 carries variance ~4, axis 1 carries ~0.0001, axes 2-3
    // are constant: the top component must be ±e_0
    val rows = (0 until 100).map { i =>
      Seq((i % 7 - 3).toDouble, ((i * 13) % 3 - 1) * 0.01, 0.5, 0.0) }
    val got = EmbedStats.principalComponent(rows.toDF("v"), "v",
      iters = 20, grid = 128).collect()
      .map(r => r.getInt(0) -> r).toMap
    val l0 = got(0).getDouble(1)
    assert(l0 * l0 > 0.999, s"loading0 $l0")
    assert(math.abs(got(1).getDouble(1)) < 0.05, got(1).toString)
    assert(got(0).getDouble(3) > 0.99, "explained share " + got(0))
    // eigenvalue ~ population variance of the quantized axis 0
    assert(math.abs(got(0).getDouble(2) - 4.0) < 0.1, got(0).toString)
  }

  test("degenerates raise loudly: null vector, oversized dim, zero " +
      "covariance") {
    val nul = Seq(Some(Seq(1.0)), None).toDF("v")
    val e1 = intercept[Exception] {
      EmbedStats.covariance(nul, "v").collect()
    }
    assert(e1.getMessage.contains("NULL vector"), e1.getMessage)
    val wide = Seq(Seq.fill(200)(1.0)).toDF("v")
    val e2 = intercept[Exception] {
      EmbedStats.covariance(wide, "v").collect()
    }
    assert(e2.getMessage.contains("dimension beyond"), e2.getMessage)
    val flat = Seq(Seq(1.0, 2.0), Seq(1.0, 2.0)).toDF("v")
    val e3 = intercept[Exception] {
      EmbedStats.principalComponent(flat, "v")
    }
    assert(e3.getMessage.contains("zero covariance"), e3.getMessage)
  }

  test("vec_moments exactness bound is ENFORCED: one planted corrupt " +
      "component raises instead of silently wrapping the cross sums") {
    // 1e12 quantizes to 1.28e14 at grid 128 — q(i)*q(j) would wrap a
    // long with no error and poison every covariance cell (r14 verdict
    // What's-wrong #1); add() must raise at the component
    val corrupt = Seq(Seq(0.5, 1.0), Seq(1e12, 1.0)).toDF("v")
    val e = intercept[Exception] {
      EmbedStats.covariance(corrupt, "v").collect()
    }
    assert(e.getMessage.contains("exactness bound"), e.getMessage)
    // the bound is a surfaced parameter: wide-but-declared data passes
    val wideVals = Seq(Seq(5.0, 1.0), Seq(6.0, 2.0)).toDF("v")
    val e2 = intercept[Exception] {
      EmbedStats.covariance(wideVals, "v", grid = 128, maxDim = 128,
        maxAbsQ = 512).collect()
    }
    assert(e2.getMessage.contains("exactness bound"), e2.getMessage)
    val ok = EmbedStats.covariance(wideVals, "v", grid = 128,
      maxDim = 128, maxAbsQ = 1024).collect()
    assert(ok.length == 3, ok.mkString("; "))
  }

  test("vec_moments raises on a NULL component (getFloat would " +
      "silently read it as 0.0 and bias every moment)") {
    val df = Seq(Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0)))
      .toDF("v")
    val e = intercept[Exception] {
      EmbedStats.covariance(df, "v").collect()
    }
    assert(e.getMessage.contains("NULL component"), e.getMessage)
  }
}
