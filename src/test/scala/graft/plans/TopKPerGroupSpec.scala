package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TopK

/** The custom top-k-per-group operator vs the window formulation: results
  * must be identical; the plan must show the two-phase heap operator with
  * an exchange between phases. */
class TopKPerGroupSpec extends SparkSpec {

  test("matches row_number window formulation exactly") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val custom = TopK.perGroup(orders, Seq("o_custkey"), "o_totalprice",
        k = 3, desc = true, tieBreak = Seq("o_orderkey"))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = orders
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[Long]("o_orderkey"))).toSet
    assert(custom === windowed)
  }

  test("property: ≡ window formulation on random inputs (nulls, ties, k)") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      n <- Gen.chooseNum(0, 120)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0L, 6L)
        v <- Gen.option(Gen.chooseNum(0, 9)) // few values => many ties
      } yield (g, v))
      k <- Gen.chooseNum(1, 5)
      desc <- Gen.oneOf(true, false)
    } yield (rows, k, desc)
    var seed = Seed(5L)
    for (round <- 1 to 20) {
      val (rows, k, desc) = genCase.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "v", "id")
      val custom = TopK.perGroup(df, Seq("g"), "v", k, desc,
          tieBreak = Seq("id"))
        .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      val ord = if (desc) col("v").desc else col("v").asc
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(ord, col("id"))
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSet
      assert(custom === windowed, s"round $round (k=$k desc=$desc)")
    }
  }

  test("plan is two-phase heap with a clustering exchange, no sort") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val df = TopK.perGroup(orders, Seq("o_custkey"), "o_totalprice",
      k = 3, tieBreak = Seq("o_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p.take(1200))
    val phases = p.linesIterator.count(_.contains("TopKPerGroup"))
    assert(phases === 2, s"expected partial+final:\n${p.take(1200)}")
    assert(p.contains("Exchange hashpartitioning(o_custkey"),
      "final phase must cluster by group")
    assert(!p.contains("Sort "), "the whole point: no group sort")
  }

  test("group filter above top-k pushes through to the parquet scan") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val df = TopK.perGroup(orders, Seq("o_custkey"), "o_totalprice",
        k = 3, tieBreak = Seq("o_orderkey"))
      .filter(col("o_custkey") < 50)
    val p = df.queryExecution.executedPlan.toString
    // without PushFilterThroughTopKPerGroup the custom node blocks
    // pushdown; with it, the group predicate reaches PushedFilters
    assert(p.contains("LessThan(o_custkey,50)"),
      s"group filter must reach the scan:\n${p.take(1500)}")
    // and results match filtering first
    val direct = TopK.perGroup(orders.filter(col("o_custkey") < 50),
        Seq("o_custkey"), "o_totalprice", k = 3, tieBreak = Seq("o_orderkey"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")))
      .toSet
    val got = df.collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("o_orderkey")))
      .toSet
    assert(got === direct)
  }

  test("non-group filter stays above the operator (not pushed)") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val withPush = TopK.perGroup(orders, Seq("o_custkey"), "o_totalprice",
        k = 3, tieBreak = Seq("o_orderkey"))
      .filter(col("o_totalprice") > 1000) // order col: push would be WRONG
    val p = withPush.queryExecution.executedPlan.toString
    assert(!p.contains("GreaterThan(o_totalprice,1000"),
      s"value filter must NOT push below top-k:\n${p.take(1500)}")
  }

  test("k larger than any group degenerates to identity") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val n = orders.count()
    val all = TopK.perGroup(orders, Seq("o_custkey"), "o_totalprice",
      k = 100000, tieBreak = Seq("o_orderkey")).count()
    assert(all === n)
  }

  test("partial-phase flush under a tiny group budget stays correct") {
    spark.conf.set("graft.topk.maxGroupsInMemory", "4")
    try {
      val li = graft.sources.Tables.lineitem(spark, sf)
      // l_partkey has ~1200 groups at sf0.001 >> budget of 4 => many flushes
      val custom = TopK.perGroup(li, Seq("l_partkey"), "l_extendedprice",
          k = 2, tieBreak = Seq("l_orderkey", "l_linenumber"))
        .collect()
        .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_orderkey"),
          r.getAs[Int]("l_linenumber"))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_partkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"))
      val windowed = li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .collect()
        .map(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_orderkey"),
          r.getAs[Int]("l_linenumber"))).toSet
      assert(custom === windowed)
    } finally spark.conf.unset("graft.topk.maxGroupsInMemory")
  }

  test("works on string group keys and ascending order") {
    val li = graft.sources.Tables.lineitem(spark, sf)
    val got = TopK.perGroup(li, Seq("l_returnflag"), "l_extendedprice",
        k = 2, desc = false, tieBreak = Seq("l_orderkey", "l_linenumber"))
      .select("l_returnflag", "l_extendedprice")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted.toSeq).toMap
    val expect = li.collect()
      .groupBy(_.getAs[String]("l_returnflag"))
      .view.mapValues(_.map(_.getAs[Double]("l_extendedprice"))
        .sorted.take(2).toSeq).toMap
    assert(got === expect)
  }
}
