package graft.queries

import graft.SparkSpec

/** Plan-shape guards (the 100 TB posture, SURVEY §4.2/§7.4): these assert
  * the physical plan the engine relies on — pushdown reaching the scan,
  * dimension joins broadcasting, global top-k compiling to
  * TakeOrderedAndProject, and the range join never degenerating into a
  * cartesian product. A regression here is a scale bug even when results
  * stay correct. */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame): String =
    q(spark, sf).queryExecution.executedPlan.toString

  test("filter predicates push into the parquet scan") {
    val p = plan(RelationalQueries.filterPred)
    assert(p.contains("PushedFilters: ["), p.take(2000))
    // the FileScan one-liner truncates the filter list; the shipdate
    // bound appearing inside PushedFilters proves pushdown reached parquet
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate pushed")
  }

  test("column pruning: scan reads only projected columns") {
    val p = plan(RelationalQueries.projCompute)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate") &&
      !readSchema.contains("l_returnflag"),
      s"unneeded columns must be pruned: $readSchema")
  }

  test("dimension join broadcasts, no shuffle of the small side") {
    val p = plan(RelationalQueries.joinBroadcast)
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("global top-k compiles to TakeOrderedAndProject") {
    val p = plan(RelationalQueries.topkOrders)
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("range join keeps its equi component (no cartesian/BNLJ)") {
    val p = plan(RelationalQueries.joinRange)
    assert(!p.contains("CartesianProduct"), "cartesian at scale = death")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range condition must ride the hash join as residual")
  }

  test("q1 aggregate does map-side partial aggregation") {
    val p = plan(RelationalQueries.q1Agg)
    val hashAggs = p.linesIterator.count(_.contains("HashAggregate"))
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n${p.take(1200)}")
  }

  test("sortWithinPartitions sorts locally without an exchange (E21)") {
    val df = graft.sources.Tables.lineitem(spark, sf)
      .sortWithinPartitions("l_shipdate")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Sort [l_shipdate"), p.take(800))
    assert(!p.contains("Exchange"), "local sort must not shuffle")
  }

  test("vector kernels run inside whole-stage codegen") {
    val df = VectorQueries.vectorCosine(spark, sf)
    val qe = df.queryExecution
    qe.executedPlan.execute().count() // finalize THIS execution's AQE plan
    val p = qe.executedPlan.toString
    // the `*(n)` prefix marks whole-stage-codegen membership in plan dumps
    val projLine = p.linesIterator
      .find(l => l.contains("Project") && l.contains("cosine_sim"))
      .getOrElse(fail(s"no cosine_sim projection in plan:\n${p.take(1200)}"))
    assert(projLine.contains("*("), s"kernel fell out of codegen: $projLine")
  }
}
