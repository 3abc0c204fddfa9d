package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Hll.registers]] / [[Hll.estimate]]: driver-side register replay,
  * the mergeability property, estimate accuracy against exact
  * distinct counts, and branch selection. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private def refRegisters(keys: Seq[Long]): Map[Long, Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.distinct.map { k =>
      val hex = md.digest(s"hll_$k".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = h >>> 24
      val suffix = h & 0xffffffL
      val rho = if (suffix == 0) 25
        else 25 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      (bucket, rho)
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
  }

  test("registers equal the driver-side md5 replay") {
    val keys = (1L to 5000L).map(_ * 7919)
    val got = Hll.registers(keys.map(Tuple1(_)).toDF("k"), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == refRegisters(keys))
  }

  test("registers merge by max: sketch(A ∪ B) = max(sketch(A), sketch(B))") {
    val a = (1L to 800L).map(Tuple1(_)).toDF("k")
    val b = (500L to 1500L).map(Tuple1(_)).toDF("k")
    val merged = Hll.registers(a, "k").withColumnRenamed("r", "ra")
      .join(Hll.registers(b, "k").withColumnRenamed("r", "rb"),
        Seq("bucket"), "full")
      .select(col("bucket"),
        greatest(coalesce(col("ra"), lit(0)), coalesce(col("rb"), lit(0)))
          .as("r"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val union = Hll.registers(a.union(b), "k")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == union)
  }

  test("estimate lands within 4σ of the truth on both branches") {
    // σ = 1.04/√256 = 6.5%; 4σ = 26% — loose enough to be stable,
    // tight enough to catch a broken register/harmonic-sum path
    for (n <- Seq(120L, 5000L, 60000L)) {
      val df = (1L to n).map(i => Tuple1(i * 104729)).toDF("k")
      val row = Hll.estimate(df, "k").collect().head
      val est = row.getDouble(4)
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("branch selection: small cardinality takes linear counting") {
    val df = (1L to 100L).map(Tuple1(_)).toDF("k")
    val row = Hll.estimate(df, "k").collect().head
    val m = row.getInt(0); val vZero = row.getLong(2)
    assert(vZero > 0)
    // LC formula replayed exactly (same rounding)
    val lc = java.math.BigDecimal.valueOf(
        m.toDouble * math.log(m.toDouble / vZero.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(row.getDouble(4) == lc)
  }

  test("grouped estimateFromRegisters equals the per-group estimate") {
    val rows = (1L to 2000L).map(i => (s"g${i % 3}", i * 31))
    val df = rows.toDF("g", "k")
    val (bucket, rho) = Hll.bucketRho(col("k"))
    val regs = df.select(col("g"), bucket.as("bucket"), rho.as("rho"))
      .groupBy("g", "bucket").agg(max("rho").cast("int").as("r"))
    val grouped = Hll.estimateFromRegisters(regs, Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Hll.estimate(df.filter(col("g") === g), "k")
        .collect().head.getDouble(4)
      assert(grouped(g) == solo, s"group $g")
    }
  }

  test("large-range collision correction and the saturation ceiling") {
    // synthetic register tables drive the branches the fixtures can't
    // reach: all registers moderately high → the −2³²·ln(1 − E/2³²)
    // branch; all registers at the max → the loud saturation raise
    def regsAt(r: Int) = (0L until 256L).map(b => (b, r)).toDF("bucket", "r")
    val alpha = 0.7213 / (1.0 + 1.079 / 256)
    val mm2 = 256.0 * 256 * (1L << 25).toDouble
    // r = 21 everywhere: s_scaled = 256·2^4 → raw = α·m²·2^25/4096
    val row = Hll.estimateFromRegisters(regsAt(21), Nil).collect().head
    val raw = alpha * mm2 / row.getLong(3)
    assert(raw > 4294967296.0 / 30.0 && raw < 4294967296.0)
    val expected = java.math.BigDecimal.valueOf(
        -4294967296.0 * math.log(1.0 - raw / 4294967296.0))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(row.getDouble(4) == expected)
    val e = intercept[Exception] {
      Hll.estimateFromRegisters(regsAt(25), Nil).collect()
    }
    assert(e.getMessage.contains("saturated"))
  }

  test("duplicates do not move the sketch") {
    val once = (1L to 300L).map(Tuple1(_)).toDF("k")
    val tripled = once.union(once).union(once)
    assert(Hll.estimate(once, "k").collect().head ==
      Hll.estimate(tripled, "k").collect().head)
  }
}
