package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Selection.groupedQuantiles]]: per-group equivalence to the global
  * [[Selection.exactQuantiles]], a driver-side percentile_disc
  * reference, bucket invariance, hot groups, and ties. */
class GroupedQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def refDisc(xs: Seq[Long], q: Double): Long = {
    val sorted = xs.sorted
    val r = math.max(1L,
      (BigDecimal(q.toString) * xs.length)
        .setScale(0, BigDecimal.RoundingMode.CEILING).toLong)
    sorted((r - 1).toInt)
  }

  test("matches the per-group driver reference, hot group included") {
    val rng = new scala.util.Random(5)
    // group "a" is hot (90% of rows) with heavy ties
    val rows = (1 to 2000).map { i =>
      val g = if (rng.nextInt(10) < 9) "a" else Seq("b", "c")(rng.nextInt(2))
      (g, rng.nextInt(50).toLong * 3)
    }
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val got = Selection.groupedQuantiles(rows.toDF("g", "v"), Seq("g"),
        "v", qs, c => c / lit(20L))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val byG = rows.groupBy(_._1)
    assert(got.size == byG.size * qs.size)
    for ((g, grp) <- byG; q <- qs) {
      val vs = grp.map(_._2)
      assert(got((g, q)) == ((vs.length.toLong, refDisc(vs, q))),
        s"g=$g q=$q")
    }
  }

  test("agrees with exactQuantiles run per group, any bucket granularity") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 600).map(i =>
      (s"g${i % 3}", rng.nextInt(1000).toLong))
    val df = rows.toDF("g", "v")
    val qs = Seq(0.05, 0.5, 0.95)
    val grouped = Selection.groupedQuantiles(df, Seq("g"), "v", qs,
        c => c / lit(7L))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val global = Selection.exactQuantiles(
          df.filter(col("g") === g), "v", qs, c => c / lit(100L))
        .collect().map(r => r.getDouble(0) ->
          (r.getLong(1), r.getLong(2))).toMap
      for (q <- qs) assert(grouped((g, q)) == global(q), s"g=$g q=$q")
    }
  }

  test("null values carry no rank; all-null group vanishes") {
    val rows = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", None),
      ("b", None))
    val got = Selection.groupedQuantiles(rows.toDF("g", "v"), Seq("g"),
      "v", Seq(0.5), c => c / lit(10L)).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a" && got.head.getLong(2) == 2 &&
      got.head.getLong(3) == 1L)
  }

  test("empty input yields empty output (the grouped contract)") {
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(Selection.groupedQuantiles(empty, Seq("g"), "v", Seq(0.5),
      c => c / lit(10L)).collect().isEmpty)
  }
}
