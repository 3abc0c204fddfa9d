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

  test("null group key merges into one group across refreshes") {
    val base = Seq((Some("a"), 1.00), (None, 2.00), (None, 3.00))
      .toDF("grp", "x")
    val delta = Seq((None: Option[String], 4.00, 1))
      .toDF("grp", "x", "op")
    val merged = IncrementalAgg.applyDelta(
      IncrementalAgg.rollup(base, g, m), delta, g, m)
    assert(merged.count() == 2, "null group must stay ONE row")
    val nullRow = merged.filter(col("grp").isNull).head()
    assert(nullRow.getAs[Long]("n") == 3)
    assert(nullRow.getAs[java.math.BigDecimal]("x_sum")
      .doubleValue() == 9.0)
  }

  test("min/max: interior deletes merge; bound deletes re-derive") {
    val base = Seq(("a", 1.0), ("a", 5.0), ("a", 9.0),
      ("b", 2.0), ("b", 4.0)).toDF("grp", "x")
    val baseRoll = IncrementalAgg.rollup(base, g, m, withMinMax = true)
    // a: delete the interior 5.0 (merge tier) + insert 0.5 (new min via
    // least); b: delete the current max 4.0 (re-derive tier)
    val delta = Seq(("a", 5.0, -1), ("a", 0.5, 1), ("b", 4.0, -1))
      .toDF("grp", "x", "op")
    val got = IncrementalAgg.applyDeltaWithMinMax(
      base, baseRoll, delta, g, m)
    val fromScratch = IncrementalAgg.rollup(
      Seq(("a", 1.0), ("a", 9.0), ("a", 0.5), ("b", 2.0))
        .toDF("grp", "x"), g, m, withMinMax = true)
    assert(got.exceptAll(fromScratch).isEmpty &&
      fromScratch.exceptAll(got).isEmpty)
  }

  test("min/max: duplicate bound survives deleting one instance") {
    // two rows share the max 7.0; deleting ONE must keep max = 7.0 —
    // the value-level net-count re-derive is what makes this correct
    val base = Seq(("a", 3.0), ("a", 7.0), ("a", 7.0)).toDF("grp", "x")
    val delta = Seq(("a", 7.0, -1)).toDF("grp", "x", "op")
    val got = IncrementalAgg.applyDeltaWithMinMax(base,
      IncrementalAgg.rollup(base, g, m, withMinMax = true), delta, g, m)
      .head()
    assert(got.getAs[Double]("x_max") == 7.0)
    assert(got.getAs[Double]("x_min") == 3.0)
    assert(got.getAs[Long]("n") == 2)
  }

  test("min/max: group deleted to its last row, and new groups") {
    val base = Seq(("a", 2.0), ("a", 8.0)).toDF("grp", "x")
    val delta = Seq(("a", 2.0, -1), ("c", 6.0, 1), ("c", 1.0, 1))
      .toDF("grp", "x", "op")
    val got = IncrementalAgg.applyDeltaWithMinMax(base,
        IncrementalAgg.rollup(base, g, m, withMinMax = true), delta, g, m)
      .collect().map(r => r.getAs[String]("grp") ->
        ((r.getAs[Double]("x_min"), r.getAs[Double]("x_max")))).toMap
    assert(got("a") == ((8.0, 8.0)), "deleting the min re-derives to 8")
    assert(got("c") == ((1.0, 6.0)), "insert-only new group merges")
  }

  test("min/max chained refresh equals from-scratch (on real orders)") {
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("grp"),
        col("o_totalprice").as("x"), col("o_orderkey"))
    val base = orders.drop("o_orderkey")
    val baseRoll = IncrementalAgg.rollup(base, g, m, withMinMax = true)
    // delete every 3rd order — certainly clips some group's bounds
    val dels = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("op", lit(-1)).drop("o_orderkey")
    val got = IncrementalAgg.applyDeltaWithMinMax(
      base, baseRoll, dels, g, m)
    val direct = IncrementalAgg.rollup(
      orders.filter(col("o_orderkey") % 3 =!= 0).drop("o_orderkey"),
      g, m, withMinMax = true)
    assert(got.exceptAll(direct).isEmpty &&
      direct.exceptAll(got).isEmpty)
  }

  test("distinct IVM: multiplicity semantics, new/vanishing values, " +
      "ghost delete raises, state side stays map-only") {
    val base = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 5L))
      .toDF("grp", "v")
    val st = IncrementalAgg.distinctState(base, Seq("grp"), "v")
    // delete ONE of a's two v=1 rows (distinct unchanged), delete a's
    // only v=2 (distinct drops), add a new value to b
    val delta = Seq(("a", 1L, -1), ("a", 2L, -1), ("b", 7L, 1))
      .toDF("grp", "v", "op")
    val st2 = IncrementalAgg.applyDistinctDelta(st, delta, Seq("grp"), "v")
    val got = IncrementalAgg.distinctCounts(st2, Seq("grp"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === Map("a" -> ((1L, 1L)), "b" -> ((2L, 2L))))
    // plan shape: the anti join's streamed (state) side must not shuffle
    val plan = st2.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val antis = plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antis.nonEmpty, plan.toString.take(1200))
    antis.foreach { j =>
      val streamed = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        case _ => j.right
      }
      assert(streamed.collect { case e: org.apache.spark.sql.execution
          .exchange.ShuffleExchangeExec => e }.isEmpty,
        "state side must stay map-only")
    }
    // ghost delete: value the state does not hold
    val ghost = Seq(("a", 99L, -1)).toDF("grp", "v", "op")
    val ex = intercept[Exception] {
      IncrementalAgg.applyDistinctDelta(st, ghost, Seq("grp"), "v")
        .collect()
    }
    assert(ex.getMessage.contains("does not hold"))
    // null values never count
    val withNull = Seq(("a", Some(1L)), ("a", None)).toDF("grp", "v")
    assert(IncrementalAgg.distinctCounts(
      IncrementalAgg.distinctState(withNull, Seq("grp"), "v"),
      Seq("grp")).collect().head.getLong(1) === 1L)
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
