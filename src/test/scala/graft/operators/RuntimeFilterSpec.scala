package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The Bloom pre-filter must be result-invisible (FPs are dropped by the
  * join) while actually pruning the large side before the shuffle. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def orders = graft.sources.Tables.orders(spark, sf)
  private def dim = graft.sources.Tables.customer(spark, sf)
    .filter(col("c_nationkey") === 1)
    .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))

  test("inner join equals the unfiltered join exactly") {
    val got = RuntimeFilter.bloomFilteredJoin(orders, dim, "o_custkey")
    val want = orders.join(dim, Seq("o_custkey"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("left_semi join equals the unfiltered semi join exactly") {
    val got = RuntimeFilter.bloomFilteredJoin(orders, dim, "o_custkey",
      joinType = "left_semi")
    val want = orders.join(dim, Seq("o_custkey"), "left_semi")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("small filters prune, never lose: pruned candidate set covers " +
      "every true match") {
    val filt = dim.agg(graft.functions.GraftFunctions
      .bloomAgg(col("o_custkey"), 1 << 20, 5).as("__b"))
    val pruned = orders.crossJoin(broadcast(filt))
      .filter(graft.functions.GraftFunctions.bloomContains(col("__b"),
        col("o_custkey"), 1 << 20, 5))
    val nPruned = pruned.count()
    val nTrue = orders.join(dim, Seq("o_custkey"), "left_semi").count()
    val nAll = orders.count()
    assert(nPruned >= nTrue, "Bloom pruning lost a true match")
    assert(nPruned < nAll,
      s"selective dim filter should prune the fact side ($nPruned/$nAll)")
  }

  test("outer/anti join types are rejected: pre-filtering would change " +
      "their results") {
    for (jt <- Seq("left", "left_anti", "full"))
      intercept[IllegalArgumentException] {
        RuntimeFilter.bloomFilteredJoin(orders, dim, "o_custkey",
          joinType = jt)
      }
  }

  test("null large-side keys are dropped by the probe, matching inner-join" +
      " semantics") {
    val large = Seq(Some(1L), Some(2L), None).toDF("k")
    val small = Seq(1L).toDF("k")
    val got = RuntimeFilter.bloomFilteredJoin(large, small, "k")
      .as[Long].collect().toSeq
    assert(got === Seq(1L))
  }
}
