package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OhlcSpec extends SparkSpec {
  import spark.implicits._

  test("open/close follow (ts, id) order; high/low are extremes") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 00:05:00"), 5.0),
      (2L, ts("2024-01-01 00:10:00"), 9.0),
      (3L, ts("2024-01-01 00:20:00"), 1.0),
      (4L, ts("2024-01-01 00:25:00"), 7.0),
      // same ts as id 4: id breaks the tie, so 5L is later -> close
      (5L, ts("2024-01-01 00:25:00"), 6.0),
      // next slot
      (6L, ts("2024-01-01 01:02:00"), 2.0))
      .map { case (id, t, v) => ("u", id, t, v) }
      .toDF("user_id", "event_id", "ts", "value")
    val out = TimeSeries.ohlc(df, "user_id", "ts", "event_id", "value",
        intervalSec = 3600)
      .orderBy("slot")
      .select("open", "high", "low", "close", "n")
      .as[(Double, Double, Double, Double, Long)].collect().toSeq
    assert(out == Seq((5.0, 9.0, 1.0, 6.0, 5L), (2.0, 2.0, 2.0, 2.0, 1L)))
  }

  test("matches the window formulation on real events") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ohlc(ev, "user_id", "ts", "event_id", "value",
        21600)
      .select("user_id", "slot", "open", "close")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "slot").orderBy("ts", "event_id")
    val want = ev
      .withColumn("slot", expr("unix_micros(ts) div 21600000000"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnd", row_number().over(w.orderBy(
        col("ts").desc, col("event_id").desc)))
      .groupBy("user_id", "slot")
      .agg(max(when(col("rn") === 1, col("value"))).as("open"),
        max(when(col("rnd") === 1, col("value"))).as("close"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("timeWeightedAvg: durations weight the step series; the open " +
      "last interval drops; single-obs keys yield NULL; dup ts raises") {
    import spark.implicits._
    def t(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val df = Seq(("k", t(0), 1.0), ("k", t(10), 2.0), ("k", t(40), 9.99),
      ("solo", t(5), 7.0)).toDF("key", "ts", "v")
    val got = TimeSeries.timeWeightedAvg(df, "key", "ts", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // 10s @ 1.00 + 30s @ 2.00 over a 40s span -> 1.75
    assert(got("k") == ((3L, Some(1.75))), got.toString)
    assert(got("solo") == ((1L, None)), got.toString)
    val dup = Seq(("k", t(0), 1.0), ("k", t(0), 2.0)).toDF("key", "ts", "v")
    val e = intercept[Exception] {
      TimeSeries.timeWeightedAvg(dup, "key", "ts", "v").collect()
    }
    assert(e.getMessage.contains("duplicate ts"), e.getMessage)
  }
}
