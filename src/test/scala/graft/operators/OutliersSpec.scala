package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("flags exactly the values beyond k*MAD of the median") {
    // group g: values 10,11,12,13,14 (med 12, MAD 1) plus 100 and 16.
    // With 7 values 10..14,16,100: med=13? sorted: 10,11,12,13,14,16,100
    // med=13, devs=3,2,1,0,1,3,87 -> sorted 0,1,1,2,3,3,87, MAD=2.
    // k=3 -> cut 6: only 87 > 6 -> 100 flagged.
    val df = Seq(10, 11, 12, 13, 14, 16, 100)
      .map(("g", _)).toDF("grp", "v")
    val out = Outliers.madFlag(df, Seq("grp"), "v", k = 3.0)
      .filter(col("is_outlier")).select("v").as[Int].collect()
    assert(out.toSeq == Seq(100))
    val s = Outliers.madSummary(df, Seq("grp"), "v", k = 3.0).head()
    assert(s.getAs[Long]("n") == 7 && s.getAs[Long]("n_outliers") == 1)
    assert(s.getAs[Double]("median") == 13.0 && s.getAs[Double]("mad") == 2.0)
  }

  test("zero MAD: any deviation from the constant majority is flagged") {
    val df = (Seq.fill(10)(5) :+ 6).map(("g", _)).toDF("grp", "v")
    val flagged = Outliers.madFlag(df, Seq("grp"), "v")
      .filter(col("is_outlier")).select("v").as[Int].collect()
    assert(flagged.toSeq == Seq(6))
  }

  test("groups are independent") {
    val df = (Seq.fill(9)(("a", 10)) :+ ("a", 50)) ++
      (Seq.fill(9)(("b", 50)) :+ ("b", 10))
    val out = Outliers.madFlag(df.toDF("grp", "v"), Seq("grp"), "v")
      .filter(col("is_outlier"))
      .select("grp", "v").as[(String, Int)].collect().toSet
    assert(out == Set(("a", 50), ("b", 10)))
  }

  test("winsorize clips to the discrete-quantile elements") {
    // 1..20: p5 rank = ceil(0.05*20) = 1 -> lo = 1 (no lower clip);
    // p95 rank = ceil(0.95*20) = 19 -> hi = 19, so only 20 clips.
    val df = (1 to 20).map(("g", _)).toDF("grp", "v")
    val got = Outliers.winsorize(df, Seq("grp"), "v", 0.05, 0.95)
      .agg(sum("winsorized"), min("__lo"), max("__hi"))
      .as[(Long, Int, Int)].head()
    assert(got == (((1 to 19).sum + 19).toLong, 1, 19))
  }

  test("winsorize: tiny groups clip to their only element") {
    val df = Seq(("g", 7)).toDF("grp", "v")
    val got = Outliers.winsorize(df, Seq("grp"), "v")
      .select("winsorized").as[Int].collect().toSeq
    assert(got == Seq(7))
  }

  test("null group keys flag within their own group and never drop") {
    // null-keyed group: 9×10 + one 50 — the 50 is its group's outlier
    val df = ((Seq.fill(9)(10) :+ 50).map((None: Option[String], _)) ++
      (Seq.fill(9)(20) :+ 90).map((Some("a"), _))).toDF("grp", "v")
    val out = Outliers.madFlag(df, Seq("grp"), "v")
    assert(out.count() == 20, "every input row survives the stats joins")
    val flagged = out.filter(col("is_outlier"))
      .select("grp", "v").as[(Option[String], Int)].collect().toSet
    assert(flagged == Set((None, 50), (Some("a"), 90)))
  }

  test("winsorize: all-null group passes through instead of vanishing") {
    val df = (Seq(("dead", None), ("dead", None)) ++
      (1 to 20).map(v => ("live", Some(v)))).toDF("grp", "v")
    val out = Outliers.winsorize(df, Seq("grp"), "v", 0.05, 0.95)
    assert(out.count() == 22, "no-bounds group must not be dropped")
    assert(out.filter(col("grp") === "dead")
      .select("winsorized").collect().forall(_.isNullAt(0)))
    // live group still clips as before
    assert(out.filter(col("grp") === "live" && col("v") === 20)
      .select("winsorized").as[Int].head() == 19)
  }

  test("winsorize: nulls neither shift the bounds nor get clipped") {
    val df = ((1 to 20).map(v => ("g", Some(v))) ++
      Seq(("g", None), ("g", None))).toDF("grp", "v")
    val out = Outliers.winsorize(df, Seq("grp"), "v", 0.05, 0.95)
    // bounds computed over the 20 non-null values only (1 and 19)
    val b = out.agg(min("__lo"), max("__hi")).as[(Int, Int)].head()
    assert(b == ((1, 19)))
    assert(out.filter(col("v").isNull)
      .select("winsorized").collect().forall(_.isNullAt(0)))
  }

  test("robustScale: exact discrete quartiles, zero-IQR group nulls, " +
      "NULL value passes through") {
    import spark.implicits._
    // group a: 1..8 -> q1 = rank ceil(.25*8)=2 -> 2, med = rank 4 -> 4,
    // q3 = rank 6 -> 6, IQR 4: scaled(8) = 1.0, scaled(1) = -0.75
    val a = (1 to 8).map(v => ("a", Some(v.toLong)))
    val b = Seq(("b", Some(5L)), ("b", Some(5L)), ("b", Some(5L)))
    val n = Seq(("a", None: Option[Long]))
    val df = (a ++ b ++ n).toDF("g", "v")
    val got = Outliers.robustScale(df, Seq("g"), "v",
        v => org.apache.spark.sql.functions.floor(v / 4)).collect()
      .map(r => (r.getString(0), Option(r.get(1)),
        Option(r.get(2)))).toSet
    assert(got.contains(("a", Some(8L), Some(1.0))), got)
    assert(got.contains(("a", Some(1L), Some(-0.75))), got)
    assert(got.contains(("b", Some(5L), None)), got)
    assert(got.contains(("a", None, None)), got)
  }
  // moved from AgreementSpec (round 13: specs named for what they test)
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
