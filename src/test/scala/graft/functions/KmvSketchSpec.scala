package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {

  test("exact below sketch threshold") {
    val o = graft.sources.Tables.orders(spark, sf)
    val r = o.agg(
      GraftFunctions.kmvDistinct(col("o_orderpriority"), 256).as("est"),
      countDistinct("o_orderpriority").as("exact")).head()
    assert(r.getLong(0) === r.getLong(1), "few distincts => exact count")
  }

  test("estimate within tolerance above threshold, incl. group-by merge") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .repartition(8) // force partial buffers + merge path
    val r = li.agg(
      GraftFunctions.kmvDistinct(col("l_partkey"), 256).as("est"),
      countDistinct("l_partkey").as("exact")).head()
    val est = r.getLong(0).toDouble
    val exact = r.getLong(1).toDouble
    assert(math.abs(est - exact) / exact <= 0.25,
      s"kmv est $est vs exact $exact") // se ~6% at k=256; 4 sd guard
    val grouped = li.groupBy("l_returnflag").agg(
      GraftFunctions.kmvDistinct(col("l_orderkey"), 256).as("est"),
      countDistinct("l_orderkey").as("exact")).collect()
    grouped.foreach { g =>
      val e = g.getLong(1).toDouble; val x = g.getLong(2).toDouble
      assert(math.abs(e - x) / x <= 0.25, s"${g.getString(0)}: $e vs $x")
    }
  }

  test("SQL surface") {
    graft.sources.Tables.orders(spark, sf).createOrReplaceTempView("o_kmv")
    val r = spark.sql(
      "SELECT kmv_distinct(o_custkey, 64) AS est FROM o_kmv").head()
    assert(r.getLong(0) > 0)
  }

  test("sketch-array agg + algebra: exact regime equals exact set ops") {
    import spark.implicits._
    import graft.operators.KmvAlgebra
    val k = 128
    val df = ((1L to 60L).map(i => ("a", i)) ++
      (41L to 100L).map(i => ("b", i))).toDF("seg", "uid")
    val sk = df.groupBy("seg")
      .agg(GraftFunctions.kmvSketch(col("uid"), k).as("sk"))
    val a = sk.filter($"seg" === "a").select(col("sk").as("ska"))
    val b = sk.filter($"seg" === "b").select(col("sk").as("skb"))
    val r = a.crossJoin(b).select(
      KmvAlgebra.unionEstimate(col("ska"), col("skb"), k).as("u"),
      KmvAlgebra.intersectEstimate(col("ska"), col("skb"), k).as("i"),
      KmvAlgebra.jaccardEstimate(col("ska"), col("skb"), k).as("j"))
      .head()
    assert(r.getLong(0) === 100L) // |1..100|
    assert(r.getLong(1) === 20L)  // |41..60|
    assert(r.getDouble(2) === 0.2)
  }

  test("algebra estimates stay within tolerance above the threshold") {
    import spark.implicits._
    import graft.operators.KmvAlgebra
    val k = 256
    // |A|=6000, |B|=6000, |A∩B|=2000, |A∪B|=10000
    val df = ((1L to 6000L).map(i => ("a", i)) ++
      (4001L to 10000L).map(i => ("b", i))).toDF("seg", "uid")
    val sk = df.groupBy("seg")
      .agg(GraftFunctions.kmvSketch(col("uid"), k).as("sk"))
    val a = sk.filter($"seg" === "a").select(col("sk").as("ska"))
    val b = sk.filter($"seg" === "b").select(col("sk").as("skb"))
    val r = a.crossJoin(b).select(
      KmvAlgebra.unionEstimate(col("ska"), col("skb"), k).as("u"),
      KmvAlgebra.intersectEstimate(col("ska"), col("skb"), k).as("i"))
      .head()
    assert(math.abs(r.getLong(0) - 10000.0) / 10000.0 <= 0.25,
      s"union est ${r.getLong(0)}")
    // intersection compounds union + Jaccard error; 2000 ± 50%
    assert(r.getLong(1) >= 1000L && r.getLong(1) <= 3000L,
      s"intersect est ${r.getLong(1)}")
  }
}
