package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TimeSeries.burstiness fixtures — moved out of OhlcSpec in round 13
  * (specs are named for what they test) and extended with the
  * sub-millisecond-gap raise (round-12 ADVICE: a 1-999 micro gap
  * truncated to 0 ms silently poisoned mu/sigma into a 0/0 NaN). */
class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  private def t(sec: Int) =
    new java.sql.Timestamp(1700000000000L + sec * 1000L)

  test("metronome = -1 exactly, hand 2-gap case, single-gap NULL") {
    // metro: gaps 10s, 10s -> sigma 0 -> B = -1
    // mix: gaps 10s, 30s (ms: 10000, 30000): mu = 20000,
    // sigma = 10000 -> B = -1/3
    val df = Seq(("metro", t(0)), ("metro", t(10)), ("metro", t(20)),
      ("mix", t(0)), ("mix", t(10)), ("mix", t(40)),
      ("solo", t(0)), ("solo", t(5))).toDF("key", "ts")
    val got = TimeSeries.burstiness(df, "key", "ts").collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("metro") == ((2L, Some(-1.0))), got.toString)
    assert(got("mix")._1 == 2L &&
      math.abs(got("mix")._2.get - (-1.0 / 3.0)) < 1e-12, got.toString)
    assert(got("solo") == ((1L, None)), got.toString)
  }

  test("duplicate ts raises") {
    val dup = Seq(("k", t(0)), ("k", t(0))).toDF("key", "ts")
    val e = intercept[Exception] {
      TimeSeries.burstiness(dup, "key", "ts").collect()
    }
    assert(e.getMessage.contains("duplicate ts"), e.getMessage)
  }

  test("sub-millisecond gap raises (would truncate to 0 on the " +
      "millis grid and NaN-poison the key)") {
    // 500-micro gap: distinct timestamps, same millisecond
    val us0 = 1700000000000000L
    val df = Seq(("k", us0), ("k", us0 + 500L), ("k", us0 + 2000000L))
      .toDF("key", "__raw")
      .select($"key", timestamp_micros($"__raw").as("ts"))
    val e = intercept[Exception] {
      TimeSeries.burstiness(df, "key", "ts").collect()
    }
    assert(e.getMessage.contains("sub-millisecond"), e.getMessage)
  }

  test("whole-millis gaps just above the floor stay exact") {
    // gaps 1 ms and 3 ms: mu = 2, sigma = 1 -> B = -1/3
    val us0 = 1700000000000000L
    val df = Seq(("k", us0), ("k", us0 + 1000L), ("k", us0 + 4000L))
      .toDF("key", "__raw")
      .select($"key", timestamp_micros($"__raw").as("ts"))
    val r = TimeSeries.burstiness(df, "key", "ts").collect().head
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(3) - (-1.0 / 3.0)) < 1e-12, r.toString)
  }
}
