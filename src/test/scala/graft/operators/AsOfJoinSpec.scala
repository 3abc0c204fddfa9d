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
}
