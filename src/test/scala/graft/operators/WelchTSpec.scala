package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** [[Drift.welchT]] against a driver-side reference on random money
  * values, plus the loud degenerate-input guards. */
class WelchTSpec extends SparkSpec {
  import spark.implicits._

  private def ref(a: Seq[Double], b: Seq[Double]) = {
    def cents(xs: Seq[Double]) =
      xs.map(x => math.floor(x * 100 + 0.5).toLong)
    def mv(xs: Seq[Long]) = {
      val n = xs.length.toLong
      val s = xs.sum
      val sq = xs.map(c => BigInt(c) * c).sum
      val mean = s.toDouble / (100.0 * n)
      val vr = (BigInt(n) * sq - BigInt(s) * s).toDouble /
        (n.toDouble * (n - 1) * 10000.0)
      (n, mean, vr)
    }
    val (na, ma, va) = mv(cents(a)); val (nb, mb, vb) = mv(cents(b))
    val sa = va / na; val sb = vb / nb
    val t = (ma - mb) / math.sqrt(sa + sb)
    val df = (sa + sb) * (sa + sb) /
      (sa * sa / (na - 1) + sb * sb / (nb - 1))
    (na, nb, ma, mb, va, vb, t, df)
  }

  test("matches the driver-side reference on random 2-dp samples") {
    val rng = new scala.util.Random(7)
    val a = Seq.fill(500)(math.floor(rng.nextDouble() * 10000) / 100.0 + 50)
    val b = Seq.fill(300)(math.floor(rng.nextDouble() * 12000) / 100.0)
    val got = Drift.welchT(a.map(Tuple1(_)).toDF("v"),
      b.map(Tuple1(_)).toDF("v"), "v").collect().head
    val (na, nb, ma, mb, va, vb, t, df) = ref(a, b)
    assert(got.getLong(0) == na && got.getLong(1) == nb)
    assert(got.getDouble(2) == ma && got.getDouble(3) == mb)
    assert(got.getDouble(4) == va && got.getDouble(5) == vb)
    // Spark's round() goes through BigDecimal.valueOf (shortest
    // decimal repr) — mirror that exactly
    def r9(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got.getDouble(6) == r9(t))
    assert(got.getDouble(7) == r9(df))
  }

  test("a clear mean shift lands a large |t|; identical samples t = 0") {
    val base = (1 to 200).map(i => 10.0 + (i % 7) * 0.25)
    val shifted = base.map(_ + 5.0)
    val t1 = Drift.welchT(shifted.map(Tuple1(_)).toDF("v"),
      base.map(Tuple1(_)).toDF("v"), "v").collect().head.getDouble(6)
    assert(t1 > 50.0, s"shift should dominate, got $t1")
    val t0 = Drift.welchT(base.map(Tuple1(_)).toDF("v"),
      base.map(Tuple1(_)).toDF("v"), "v").collect().head.getDouble(6)
    assert(t0 == 0.0)
  }

  test("degenerate inputs raise loudly") {
    val ok = Seq(1.0, 2.0, 3.0).map(Tuple1(_)).toDF("v")
    val tiny = Seq(1.0).map(Tuple1(_)).toDF("v")
    val e1 = intercept[Exception] {
      Drift.welchT(tiny, ok, "v").collect()
    }
    assert(e1.getMessage.contains("n >= 2"))
    val flatA = Seq(5.0, 5.0, 5.0).map(Tuple1(_)).toDF("v")
    val flatB = Seq(7.0, 7.0).map(Tuple1(_)).toDF("v")
    val e2 = intercept[Exception] {
      Drift.welchT(flatA, flatB, "v").collect()
    }
    assert(e2.getMessage.contains("zero variance"))
    // one flat side is fine — Welch never pools
    val t = Drift.welchT(flatA, Seq(6.0, 8.0).map(Tuple1(_)).toDF("v"),
      "v").collect().head.getDouble(6)
    assert(t.abs > 0.0 && !t.isNaN)
  }

  test("welchTByGroup equals per-group welchT bit-for-bit; bad cells drop") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 1200).map { i =>
      val g = s"g${i % 4}"
      val arm = if (rng.nextBoolean()) "x" else "y"
      (g, arm, math.floor(rng.nextDouble() * 5000) / 100.0 + 1)
    } ++ Seq(
      ("tiny", "x", 1.0), ("tiny", "y", 2.0), ("tiny", "y", 3.0),
      // n_x = 1 < 2 → dropped
      ("flat", "x", 5.0), ("flat", "x", 5.0),
      ("flat", "y", 5.0), ("flat", "y", 5.0), // zero variance → dropped
      ("g0", "z", 999999.0)) // foreign arm value ignored
    val df = rows.toDF("g", "arm", "v")
    val got = Drift.welchTByGroup(df, Seq("g"), "arm", "x", "y", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("g0", "g1", "g2", "g3"))
    for (g <- got.keySet) {
      val solo = Drift.welchT(
        df.filter(col("g") === g && col("arm") === "x").select("v"),
        df.filter(col("g") === g && col("arm") === "y").select("v"),
        "v").collect().head
      val gr = got(g)
      assert(gr.getLong(1) == solo.getLong(0) &&
        gr.getLong(2) == solo.getLong(1), s"$g counts")
      (3 to 8).foreach(i =>
        assert(gr.getDouble(i) == solo.getDouble(i - 1), s"$g col $i"))
    }
  }

  test("cents beyond the exact-square bound raise the sharding remedy") {
    val big = Seq(4.0e7, 1.0, 2.0).map(Tuple1(_)).toDF("v")
    val ok = Seq(1.0, 2.0).map(Tuple1(_)).toDF("v")
    val e = intercept[Exception] {
      Drift.welchT(big, ok, "v").collect()
    }
    assert(e.getMessage.contains("shard"))
  }
}
