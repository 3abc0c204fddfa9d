package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Feature-engineering operators against closed-form fixtures. */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("equi-depth bins: equal counts, deterministic under ties, " +
      "group-independent") {
    val df = ((1 to 8).map(i => ("g1", i.toLong, i.toLong)) ++
      (1 to 5).map(i => ("g2", 7L, i.toLong))) // all-tied group
      .toDF("g", "v", "id")
    val got = Features.equiDepthBins(df, Seq("g"), "v", 4, Seq("id"))
      .select("g", "id", "bin").as[(String, Long, Int)].collect()
    val g1 = got.filter(_._1 == "g1").map(r => r._2 -> r._3).toMap
    assert(g1 === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2,
      6L -> 2, 7L -> 3, 8L -> 3))
    // ties broken by id: ranks 1..5 over 4 bins → sizes 2,1,1,1
    val g2 = got.filter(_._1 == "g2").map(r => r._2 -> r._3).toMap
    assert(g2 === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 2, 5L -> 3))
  }

  test("LOO target encoding: excludes own row; singleton null") {
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 7.0)).toDF("id", "cat", "t")
    val got = Features.targetEncodeLoo(df, "cat", "t")
      .select("id", "target_enc")
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L) === Some(25.0)) // (20+30)/2
    assert(got(2L) === Some(20.0)) // (10+30)/2
    assert(got(3L) === Some(15.0))
    assert(got(4L) === None)       // singleton category
  }

  test("correlation matrix: exact ±1 on linear columns, matches the " +
      "closed form elsewhere") {
    val df = (1 to 20).map { i =>
      (i.toDouble, 2.0 * i + 3, -1.0 * i, (i % 4).toDouble)
    }.toDF("x", "y2", "neg", "m")
    val got = Features.corrMatrix(df, Seq("x", "y2", "neg", "m"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    // deterministic but not exactly ±1: sqrt(D)·sqrt(k²D) rounds a ulp
    assert(math.abs(got(("x", "y2")) - 1.0) < 1e-14)
    assert(math.abs(got(("x", "neg")) + 1.0) < 1e-14)
    // reference Pearson for the non-degenerate pair
    val xs = (1 to 20).map(_.toDouble)
    val ms = (1 to 20).map(i => (i % 4).toDouble)
    val n = 20.0
    val ref = (n * xs.zip(ms).map { case (a, b) => a * b }.sum -
      xs.sum * ms.sum) /
      (math.sqrt(n * xs.map(a => a * a).sum - xs.sum * xs.sum) *
        math.sqrt(n * ms.map(a => a * a).sum - ms.sum * ms.sum))
    assert(math.abs(got(("x", "m")) - ref) < 1e-12)
  }

  test("categorical dependence: closed-form 2x2 table, independence " +
      "→ zero terms, null category kept as its own cell") {
    // perfectly dependent 2x2: (a1,b1)x4, (a2,b2)x4
    val dep = (Seq.fill(4)(("a1", "b1")) ++ Seq.fill(4)(("a2", "b2")))
      .toDF("x", "y")
    val depRows = Features.catDependence(dep, "x", "y").collect()
    // chi2 total over present cells = 2·(4−2)²/2 = 4; MI term per cell
    // = 0.5·ln(2)
    assert(depRows.map(_.getAs[Double]("chi2_term")).sum === 4.0)
    depRows.foreach { r =>
      assert(math.abs(r.getAs[Double]("mi_term") -
        BigDecimal(0.5 * math.log(2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // independent: uniform 2x2
    val ind = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2"))
      .toDF("x", "y")
    Features.catDependence(ind, "x", "y").collect().foreach { r =>
      assert(r.getAs[Double]("chi2_term") === 0.0)
      assert(r.getAs[Double]("mi_term") === 0.0)
    }
    // null category is a real cell
    val withNull = Seq((Some("a"), Some("b")),
      (None: Option[String], Some("b"))).toDF("x", "y")
    val cells = Features.catDependence(withNull, "x", "y").collect()
    assert(cells.length === 2)
    assert(cells.exists(_.isNullAt(0)))
  }

  test("grouped correlation: per-group reference values, degenerate " +
      "groups null, groups independent") {
    val df = (
      (1 to 10).map(i => ("up", i.toDouble, 3.0 * i + 1)) ++
      (1 to 10).map(i => ("down", i.toDouble, -2.0 * i)) ++
      (1 to 10).map(i => ("flat", i.toDouble, 5.0)) ++   // zero variance
      Seq(("tiny", 1.0, 2.0))                            // single pair
    ).toDF("g", "x", "y")
    val got = Features.groupedCorr(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got("up")._1 === 10L)
    assert(math.abs(got("up")._2.get - 1.0) < 1e-14)
    assert(math.abs(got("down")._2.get + 1.0) < 1e-14)
    assert(got("flat")._2.isEmpty)  // zero y-variance
    assert(got("tiny")._2.isEmpty)  // < 2 pairs
  }

  test("grouped correlation rejects nulls loudly") {
    val df = Seq(("g", Some(1.0), Some(2.0)), ("g", Some(3.0), None))
      .toDF("g", "x", "y")
    val ex = intercept[Exception] {
      Features.groupedCorr(df, Seq("g"), "x", "y").collect()
    }
    assert(ex.getMessage.contains("null values"))
  }

  test("correlation matrix rejects null values loudly") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(3.0), None))
      .toDF("x", "y")
    val ex = intercept[Exception] {
      Features.corrMatrix(df, Seq("x", "y")).collect()
    }
    assert(ex.getMessage.contains("null values"))
  }

  test("magnitudes past the long-product range fail loudly, at the " +
      "exact boundary") {
    // 3037000499 cents squares just under 2^63; one cent more wraps
    val ok = Seq((30370004.99, 1.0), (-30370004.99, 2.0), (1.0, 3.0))
      .toDF("x", "y")
    assert(Features.corrMatrix(ok, Seq("x", "y")).count() === 1L)
    val over = Seq((30370005.00, 1.0), (1.0, 2.0)).toDF("x", "y")
    val ex = intercept[Exception] {
      Features.corrMatrix(over, Seq("x", "y")).collect()
    }
    assert(ex.getMessage.contains("long-product range"), ex.getMessage)
    val exG = intercept[Exception] {
      Features.groupedCorr(over.withColumn("g", lit("g")), Seq("g"),
        "x", "y").collect()
    }
    assert(exG.getMessage.contains("long-product range"), exG.getMessage)
  }

  test("cramersV: perfect association is 1, independence is 0, " +
      "degenerate tables raise") {
    import spark.implicits._
    val perfect = (Seq.fill(3)(("a1", "b1")) ++ Seq.fill(3)(("a2", "b2")))
      .toDF("a", "b")
    val rp = Features.cramersV(perfect, "a", "b").collect().head
    assert((rp.getLong(0), rp.getLong(1), rp.getLong(2)) == ((6L, 2L, 2L)))
    assert(rp.getDouble(3) === 1.0, rp.toString)
    val indep = Seq(("a1", "b1"), ("a1", "b2"), ("a2", "b1"),
      ("a2", "b2")).toDF("a", "b")
    val ri = Features.cramersV(indep, "a", "b").collect().head
    assert(ri.getDouble(3) === 0.0, ri.toString)
    val oneCol = Seq(("a1", "b1"), ("a2", "b1")).toDF("a", "b")
    val e = intercept[Exception] {
      Features.cramersV(oneCol, "a", "b").collect()
    }
    assert(e.getMessage.contains("single row or column"), e.getMessage)
    val e2 = intercept[Exception] {
      Features.cramersV(indep, "a", "b", maxCells = 3).collect()
    }
    assert(e2.getMessage.contains("more than 3 cells"), e2.getMessage)
  }
}
