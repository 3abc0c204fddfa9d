package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tolerance checks for the approximate operators that are deliberately
  * NOT hash-matched (SURVEY §5.2 item 3: E15 HLL, E38 ANN recall lives in
  * AnnSearchSpec). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within documented rsd of exact") {
    val o = graft.sources.Tables.orders(spark, sf)
    val rows = o.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("exact"),
        approx_count_distinct("o_custkey").as("approx")) // default rsd 5%
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.15,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val r = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx"))
      .head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx $approx vs exact $exact")
  }
}
