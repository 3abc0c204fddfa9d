package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The IVM invariant: base ⊕ delta must equal rollup(base ∪ delta)
  * EXACTLY — it is what lets refreshes chain without drift. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val g = Seq("grp")
  private val m = Seq("x")

  test("merge equals from-scratch recomputation, exactly") {
    val base = Seq(("a", 10.25), ("a", 1.50), ("b", 3.00)).toDF("grp", "x")
    val delta = Seq(
      ("a", 1.50, -1),  // delete one of a's rows
      ("b", 2.25, 1),   // insert into existing group
      ("c", 9.99, 1))   // new group
      .toDF("grp", "x", "op")
    val merged = IncrementalAgg.applyDelta(
      IncrementalAgg.rollup(base, g, m), delta, g, m)
    val fromScratch = IncrementalAgg.rollup(
      Seq(("a", 10.25), ("b", 3.00), ("b", 2.25), ("c", 9.99))
        .toDF("grp", "x"), g, m)
    assert(merged.exceptAll(fromScratch).isEmpty &&
      fromScratch.exceptAll(merged).isEmpty)
  }

  test("a group deleted to zero rows disappears") {
    val base = Seq(("a", 5.00), ("b", 7.00)).toDF("grp", "x")
    val delta = Seq(("b", 7.00, -1)).toDF("grp", "x", "op")
    val merged = IncrementalAgg.applyDelta(
      IncrementalAgg.rollup(base, g, m), delta, g, m)
    assert(merged.select("grp").as[String].collect().toSeq == Seq("a"))
  }

  test("chained refreshes equal one big refresh (on real orders)") {
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("grp"),
        col("o_totalprice").as("x"), col("o_orderkey"))
    val base = IncrementalAgg.rollup(orders, g, m)
    val d1 = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("op", lit(-1)).drop("o_orderkey")
    val d2 = orders.filter(col("o_orderkey") % 3 === 1)
      .withColumn("op", lit(-1)).drop("o_orderkey")
    val chained = IncrementalAgg.applyDelta(
      IncrementalAgg.applyDelta(base, d1, g, m), d2, g, m)
    val direct = IncrementalAgg.rollup(
      orders.filter(col("o_orderkey") % 3 === 2), g, m)
    assert(chained.exceptAll(direct).isEmpty &&
      direct.exceptAll(chained).isEmpty)
  }
}
