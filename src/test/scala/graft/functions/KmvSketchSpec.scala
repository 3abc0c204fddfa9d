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
}
