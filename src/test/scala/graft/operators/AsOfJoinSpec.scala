package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest prior right row per key, ties inclusive") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 01:00:00")),  // after both rights
      (2L, 10L, ts("2024-01-01 00:30:00")),  // exactly at right #1 (tie)
      (3L, 10L, ts("2024-01-01 00:10:00")),  // before all rights -> null
      (4L, 99L, ts("2024-01-01 12:00:00")))  // key with no rights -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:30:00")),
      (10L, ts("2024-01-01 00:45:00")))
      .toDF("user_id", "ts")

    val out = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("ts"))
      .select("event_id", "asof_ts")
      .collect().map(r => r.getLong(0) ->
        Option(r.getTimestamp(1)).map(_.toString).orNull).toMap

    assert(out(1L) === "2024-01-01 00:45:00.0")
    assert(out(2L) === "2024-01-01 00:30:00.0") // inclusive >= semantics
    assert(out(3L) === null)
    assert(out(4L) === null)
  }

  test("tolerance nulls out matches older than the lookback window") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 02:00:00")),  // prior right is 75 min old
      (2L, 10L, ts("2024-01-01 01:00:00")))  // prior right is 15 min old
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 00:45:00"))).toDF("user_id", "ts")
    val out = AsOfJoin(left, right, "user_id", "ts", "ts", Seq("ts"),
        tolerance = Some("30 MINUTES"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(3))).toMap
    assert(out(1L).isEmpty, "match beyond tolerance must be null")
    assert(out(2L).map(_.toString).contains("2024-01-01 00:45:00.0"))
  }

  test("custom node ≡ windowed formulation on real events (differential)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts", "value")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    for (tol <- Seq(None, Some("45 MINUTES"))) {
      val a = canon(AsOfJoin(purchases, views, "user_id", "ts", "ts",
        Seq("ts", "value"), tol))
      val b = canon(AsOfJoin.windowed(purchases, views, "user_id", "ts", "ts",
        Seq("ts", "value"), tol))
      assert(a.length == b.length && a.zip(b).forall(p => p._1 == p._2),
        s"node vs windowed diverge (tol=$tol)")
    }
  }

  test("null carry value stays null (no fallback to an older right row)") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts("2024-01-01 01:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:30:00"), Option(5.0)),
      (10L, ts("2024-01-01 00:45:00"), Option.empty[Double])) // latest: null v
      .toDF("user_id", "ts", "v")
    for (impl <- Seq(AsOfJoin(left, right, "user_id", "ts", "ts",
        Seq("ts", "v")), AsOfJoin.windowed(left, right, "user_id", "ts",
        "ts", Seq("ts", "v")))) {
      val r = impl.select("asof_ts", "asof_v").collect().head
      assert(r.getTimestamp(0).toString === "2024-01-01 00:45:00.0")
      assert(r.isNullAt(1),
        "carried value must come from the matched row, even when null")
    }
  }

  test("filters push through the as-of node into the parquet scans") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts")
    val filtered = AsOfJoin(purchases, views, "user_id", "ts", "ts", Seq("ts"))
      .filter(col("user_id") < 100)
    val optimized = filtered.queryExecution.optimizedPlan
    // the Filter must sit BELOW the as-of node after optimization — on
    // both sides, since a key predicate prunes right-side build rows too
    val nodes = optimized.collect {
      case aj: graft.plans.AsOfJoinNode => aj }
    assert(nodes.size == 1, optimized.toString)
    val aj = nodes.head
    def hasKeyFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("< 100") => f
      }.nonEmpty
    assert(hasKeyFilter(aj.left), s"left push missing:\n$optimized")
    assert(hasKeyFilter(aj.right), s"right push missing:\n$optimized")
    // and the rows still come out right
    assert(filtered.count() ===
      AsOfJoin.windowed(purchases, views, "user_id", "ts", "ts", Seq("ts"))
        .filter(col("user_id") < 100).count())
  }

  test("null keys never match, in both formulations") {
    import spark.implicits._
    val left = Seq((1L, Option(10L), ts("2024-01-01 01:00:00")),
      (2L, Option.empty[Long], ts("2024-01-01 01:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((Option(10L), ts("2024-01-01 00:30:00")),
      (Option.empty[Long], ts("2024-01-01 00:40:00"))) // null-keyed build row
      .toDF("user_id", "ts")
    for (impl <- Seq(
        AsOfJoin(left, right, "user_id", "ts", "ts", Seq("ts")),
        AsOfJoin.windowed(left, right, "user_id", "ts", "ts", Seq("ts")))) {
      val out = impl.select("event_id", "asof_ts").collect()
        .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
      assert(out(1L).map(_.toString).contains("2024-01-01 00:30:00.0"))
      assert(out(2L).isEmpty, "null = null must NOT match (SQL equality)")
    }
  }

  test("composite keys: match must agree on every key column") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
      .withColumn("bucket", col("user_id") % 3)
    val views = ev.filter(col("event_type") === "view")
      .select("user_id", "ts").withColumn("bucket", col("user_id") % 3)
    val got = AsOfJoin.onKeys(purchases, views, Seq("user_id", "bucket"),
      "ts", "ts", Seq("ts"))
    val win = AsOfJoin.windowedOnKeys(purchases, views,
      Seq("user_id", "bucket"), "ts", "ts", Seq("ts"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "asof_ts").collect()
        .map(r => r.getLong(0) -> String.valueOf(r.get(1))).toMap
    assert(canon(got) === canon(win))
    // and a key tuple that only partially matches must NOT join: bucket
    // is derived from user_id here, so single-key results coincide —
    // verify with a probe whose bucket is deliberately broken
    val broken = purchases.withColumn("bucket", col("bucket") + 100)
    val none = AsOfJoin.onKeys(broken, views, Seq("user_id", "bucket"),
      "ts", "ts", Seq("ts"))
    assert(none.filter(col("asof_ts").isNotNull).count() === 0)
  }

  test("type mismatches and non-timestamp tolerance are rejected loudly") {
    import spark.implicits._
    val l = Seq((1L, 10, ts("2024-01-01 01:00:00")))
      .toDF("event_id", "user_id", "ts") // key INT
    val r = Seq((10L, ts("2024-01-01 00:30:00"))).toDF("user_id", "ts") // BIGINT
    intercept[IllegalArgumentException](
      AsOfJoin(l, r, "user_id", "ts", "ts", Seq("ts")))
    val lLong = Seq((1L, 10L, 5000L)).toDF("event_id", "user_id", "ts")
    val rLong = Seq((10L, 4000L)).toDF("user_id", "ts")
    // long ts fine without tolerance…
    AsOfJoin(lLong, rLong, "user_id", "ts", "ts", Seq("ts"))
    // …but tolerance arithmetic requires timestamps
    intercept[IllegalArgumentException](
      AsOfJoin(lLong, rLong, "user_id", "ts", "ts", Seq("ts"),
        tolerance = Some("1 hour")))
  }

  test("matches DuckDB ASOF semantics on real events (vs window oracle)") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view").select("user_id", "ts")
    val got = AsOfJoin(purchases, views, "user_id", "ts", "ts", Seq("ts"))

    // independent oracle: max prior view ts via a join + group
    val expected = purchases.as("p")
      .join(views.as("v"),
        col("p.user_id") === col("v.user_id") && col("v.ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.event_id"))
      .agg(max(col("v.ts")).as("expect_ts"))

    val joined = got.join(expected, "event_id")
      .filter(
        (col("asof_ts").isNull =!= col("expect_ts").isNull) ||
          (col("asof_ts").isNotNull && col("asof_ts") =!= col("expect_ts")))
    assert(joined.count() === 0)
  }

  test("forward as-of: earliest right row at or after the left ts; " +
      "tolerance bounds the look-ahead") {
    import spark.implicits._
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val l = Seq((1L, "k", t(10)), (2L, "k", t(50))).toDF("id", "k", "ts")
    val r = Seq(("k", t(5), 1.0), ("k", t(12), 2.0), ("k", t(30), 3.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.forward(l, r, "k", "ts", "ts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some(x.getDouble(1)))).toMap
    // id 1 (t10): next at-or-after is t12 -> 2.0; id 2 (t50): none
    assert(got == Map(1L -> Some(2.0), 2L -> None), got.toString)
    val tol = AsOfJoin.forward(l, r, "k", "ts", "ts", Seq("v"),
      tolerance = Some("1 MINUTE"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some(x.getDouble(1)))).toMap
    // t12 is 2 min past t10 -> outside a 1-minute look-ahead
    assert(tol == Map(1L -> None, 2L -> None), tol.toString)
    // exact-tie: a right row AT the left ts matches forward
    val r2 = Seq(("k", t(10), 9.0)).toDF("k", "ts", "v")
    val tie = AsOfJoin.forward(l, r2, "k", "ts", "ts", Seq("v"))
      .select("id", "asof_v").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None
        else Some(x.getDouble(1)))).toMap
    assert(tie(1L) == Some(9.0), tie.toString)
  }
}
