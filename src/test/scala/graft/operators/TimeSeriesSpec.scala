package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form oracles for per-key EMA feature extraction. */
class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val fixture = Seq(
    ("a", 1L, ts(10), 1.0), ("a", 2L, ts(20), 2.0), ("a", 3L, ts(30), 3.0),
    ("b", 4L, ts(10), 10.0), ("b", 5L, ts(5), 20.0))
    .toDF("k", "event_id", "ts", "value")

  test("ema recurrence, delta, and lag are exact per key") {
    val got = TimeSeries
      .emaFeatures(fixture, "k", "ts", "event_id", "value", alpha = 0.5)
      .orderBy("k", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]), r.getDouble(6)))
      .toSeq
    assert(got == Seq(
      ("a", 1L, None, None, 1.0),
      ("a", 2L, Some(1.0), Some(1.0), 1.5),
      ("a", 3L, Some(2.0), Some(1.0), 2.25),
      // key b: ordered by ts, so event 5 (ts 5) precedes event 4
      ("b", 5L, None, None, 20.0),
      ("b", 4L, Some(20.0), Some(-10.0), 15.0)), s"got $got")
  }

  test("hot key fails loudly instead of materializing a giant row") {
    val whale = (1L to 20L).map(i => ("whale", i, ts(i), i.toDouble))
    val df = (whale :+ (("minnow", 99L, ts(1), 1.0)))
      .toDF("k", "event_id", "ts", "value")
    val ex = intercept[Exception] {
      TimeSeries.emaFeatures(df, "k", "ts", "event_id", "value",
        alpha = 0.5, maxEventsPerKey = 5).collect()
    }
    assert(ex.getMessage.contains("whale") &&
      ex.getMessage.contains("exceeds 5 events"))
    assert(TimeSeries.emaFeatures(df, "k", "ts", "event_id", "value",
      alpha = 0.5, maxEventsPerKey = 50).count() === 21L)
  }

  test("row count and key coverage match the input") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value")
    val out = TimeSeries.emaFeatures(ev, "user_id", "ts", "event_id",
      "value", alpha = 0.3)
    assert(out.count() == ev.count(), "one output row per event")
    assert(out.filter(col("ema").isNull).count() == 0)
    // first event per key carries no lag
    val firsts = out.filter(col("prev_value").isNull).count()
    assert(firsts == ev.select("user_id").distinct().count())
  }

  test("resample fills interior gaps, marks them, and never invents leads") {
    // 10s slots; key a observes slots 1,2,5 — 3,4 are gaps inheriting
    // slot 2's LAST value (two obs in slot 2, the later one wins)
    val ev = Seq(
      ("a", 1L, ts(10), 1.0), ("a", 2L, ts(21), 2.0),
      ("a", 3L, ts(27), 7.0), ("a", 4L, ts(55), 5.0),
      ("b", 5L, ts(40), 9.0))
      .toDF("k", "event_id", "ts", "value")
    val got = TimeSeries.resample(ev, "k", "ts", "event_id", "value",
        intervalSec = 10L)
      .orderBy("k", "slot_ts")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000L,
        r.getLong(2), r.getBoolean(3), r.getDouble(4)))
      .toSeq
    assert(got == Seq(
      ("a", 10L, 1L, false, 1.0),
      ("a", 20L, 2L, false, 7.0),
      ("a", 30L, 0L, true, 7.0),
      ("a", 40L, 0L, true, 7.0),
      ("a", 50L, 1L, false, 5.0),
      ("b", 40L, 1L, false, 9.0)), s"got $got")
  }

  test("resample covers every key with a contiguous grid at sf") {
    val ev = graft.sources.Tables.events(spark, sf)
    val out = TimeSeries.resample(ev, "user_id", "ts", "event_id",
      "value", intervalSec = 21600L)
    assert(out.filter(col("value").isNull).count() == 0,
      "forward fill leaves no nulls (grids start at first observation)")
    // contiguity: per key, slot count == (max - min)/interval + 1
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        ((unix_timestamp(max("slot_ts")) - unix_timestamp(min("slot_ts")))
          / 21600 + 1).cast("long").as("expect"))
      .filter(col("n") =!= col("expect")).count()
    assert(bad == 0, "every key's grid is gap-free")
  }

  test("one shuffle: no window exchange beyond the key groupBy") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val ev = graft.sources.Tables.events(spark, sf)
        .select("user_id", "event_id", "ts", "value")
      val n = TimeSeries.emaFeatures(ev, "user_id", "ts", "event_id",
          "value", alpha = 0.5)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec => e
        }.size
      assert(n == 1, s"expected exactly one exchange, got $n")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rolling z-score: trailing frame excludes current row, minObs " +
      "gates, constant baseline scores null") {
    import spark.implicits._
    // key A: 1..5 then a spike; key B: constant baseline then a spike
    val rows = ((1 to 5).map(i => ("A", i.toLong, i.toLong, i.toDouble)) :+
      (("A", 6L, 6L, 100.0))) ++
      ((1 to 5).map(i => ("B", i.toLong, 100L + i, 7.0)) :+
        (("B", 6L, 106L, 50.0)))
    val df = rows.toDF("k", "min", "id", "v")
      .selectExpr("k", "timestamp_millis(min * 60000) AS ts", "id", "v")
    val got = TimeSeries.rollingZscore(df, "k", "ts", "id", "v",
        window = 5, minObs = 5, k = 3.0)
      .select("k", "id", "n_frame", "z", "is_anomaly")
      .as[(String, Long, Long, Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // A's first five rows: frames of 0..4 rows -> below minObs, null z
    for (i <- 1L to 5L) assert(got(("A", i))._2.isEmpty)
    // A's spike: frame = {1..5}, mu 3, var 2 -> z = (100-3)/sqrt(2)
    val (nf, z, flag) = got(("A", 6L))
    assert(nf === 5L)
    assert(math.abs(z.get - (100.0 - 3.0) / math.sqrt(2.0)) < 1e-12)
    assert(flag)
    // B's spike: constant frame -> zero variance -> null z, not flagged
    val (nfB, zB, flagB) = got(("B", 106L))
    assert(nfB === 5L && zB.isEmpty && !flagB)
  }

  test("decompose recovers a planted weekly signal exactly") {
    import java.sql.Date
    // 21 days, value = 100 + seasonal(phase): phase 0 -> +6, else -1
    // (zero-mean). Interior trend = 100 exactly (each full 7-day frame
    // covers every phase once), seasonal = planted, residual = 0.
    val rows = (0 until 21).map { di =>
      val s = if (di % 7 == 0) 6.0 else -1.0
      ("k", Date.valueOf(java.time.LocalDate.ofEpochDay(di.toLong)),
        100.0 + s)
    }
    val got = TimeSeries.decompose(
        rows.toDF("k", "day", "v"), "k", "day", "v", period = 7)
      .orderBy("day").collect()
    assert(got.length == 21)
    got.zipWithIndex.foreach { case (r, di) =>
      val nFrame = r.getAs[Long]("n_frame")
      if (di < 3 || di > 17) {
        assert(nFrame < 7 && r.isNullAt(r.fieldIndex("trend")) &&
          r.isNullAt(r.fieldIndex("residual")),
          s"edge day $di must have null trend: $r")
      } else {
        val want = if (di % 7 == 0) 6.0 else -1.0
        assert(nFrame == 7 && r.getAs[Double]("trend") == 100.0 &&
          r.getAs[Double]("seasonal") == want &&
          r.getAs[Double]("residual") == 0.0, s"day $di: $r")
      }
    }
  }

  test("decompose: a slot gap nulls nearby trends instead of " +
      "averaging across the hole") {
    import java.sql.Date
    val rows = (0 until 21).filterNot(_ == 10).map { di =>
      ("k", Date.valueOf(java.time.LocalDate.ofEpochDay(di.toLong)), 1.0)
    }
    val got = TimeSeries.decompose(
        rows.toDF("k", "day", "v"), "k", "day", "v", period = 7)
      .collect().map(r => java.time.LocalDate
        .parse(r.getAs[Date]("day").toString).toEpochDay.toInt ->
        Option(r.getAs[Any]("trend"))).toMap
    // days 7..13 have day 10 inside their frame -> n_frame 6 -> null
    (7 to 13).filterNot(_ == 10).foreach(di =>
      assert(got(di).isEmpty, s"day $di frame spans the gap"))
    assert(got(5).isDefined && got(15).isDefined)
  }

  test("decompose: a duplicate (key, slot) row fails loudly instead " +
      "of double-counting the frame") {
    import java.sql.Date
    val rows = (0 until 9).map(i =>
      ("k", Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong)), 1.0)) :+
      (("k", Date.valueOf(java.time.LocalDate.ofEpochDay(4L)), 2.0))
    val ex = intercept[Exception] {
      TimeSeries.decompose(rows.toDF("k", "day", "v"),
        "k", "day", "v", period = 7).collect()
    }
    assert(ex.getMessage.contains("duplicate slot"))
  }

  test("decompose rejects even periods") {
    import java.sql.Date
    val df = Seq(("k", Date.valueOf("2024-01-01"), 1.0))
      .toDF("k", "day", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.decompose(df, "k", "day", "v", period = 6)
    }
  }

  test("cusum: planted level shift alarms at the accumulation point, " +
      "stable series never alarms, reset after dip") {
    import java.sql.Date
    def day(i: Int) = Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong))
    // mu = 10, slack 1, threshold 5: values 10,10,14,14,14,6,10
    // s_pos: 0,0,3,6(alarm),9(alarm),4,3 (decays by 5 then 1, no
    // hard reset); s_neg rises to 3 on the dip, decays to 2
    val rows = Seq(10.0, 10.0, 14.0, 14.0, 14.0, 6.0, 10.0)
      .zipWithIndex.map { case (v, i) => ("k", day(i), v, 10.0) }
    val got = TimeSeries.cusum(
        rows.toDF("k", "day", "v", "mu"), "k", "day", "v", "mu",
        slack = 1.0, threshold = 5.0)
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (0.0, 0.0, false), (0.0, 0.0, false), (3.0, 0.0, false),
      (6.0, 0.0, true), (9.0, 0.0, true), (4.0, 3.0, false),
      (3.0, 2.0, false)), got.toSeq.toString)
  }

  test("cusum: hot key fails loudly") {
    import java.sql.Date
    val rows = (0 until 10).map(i =>
      ("k", Date.valueOf(java.time.LocalDate.ofEpochDay(i.toLong)),
        1.0, 1.0))
    val ex = intercept[Exception] {
      TimeSeries.cusum(rows.toDF("k", "day", "v", "mu"),
        "k", "day", "v", "mu", 1.0, 5.0, maxEventsPerKey = 4).collect()
    }
    assert(ex.getMessage.contains("exceeds 4"))
  }

  test("resampleInterp: gaps take the linear bridge, knowns untouched") {
    import java.sql.Timestamp
    def ts(h: Int) = new Timestamp(h * 3600L * 1000L)
    // hourly slots: known at h0 (v=10) and h3 (v=40); h1, h2 are gaps
    // → 20 and 30; a second known pair 40→40 stays flat
    val ev = Seq((1L, ts(0), 1L, 10.0), (1L, ts(3), 2L, 40.0),
      (1L, ts(5), 3L, 40.0)).toDF("k", "ts", "id", "v")
    val got = TimeSeries.resampleInterp(ev, "k", "ts", "id", "v", 3600L)
      .orderBy("slot_ts")
      .select("value", "is_gap")
      .as[(Double, Boolean)].collect().toSeq
    assert(got == Seq((10.0, false), (20.0, true), (30.0, true),
      (40.0, false), (40.0, true), (40.0, false)))
  }

  test("clampedCumsum: saturates at both bounds, recovers, keys isolate") {
    // k=a from 10 in [0,15]: +10→15 (cap), -20→0 (floor), +3→3, -1→2
    // k=b untouched by a's history
    val ev = Seq(("a", 1L, 10L), ("a", 2L, -20L), ("a", 3L, 3L),
      ("a", 4L, -1L), ("b", 1L, -4L))
      .toDF("k", "slot", "v").repartition(3)
    val got = TimeSeries.clampedCumsum(ev, "k", "slot", "v",
        lo = 0L, hi = 15L, init = 10L)
      .orderBy("k", "slot")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 10L, 15L), ("a", 2L, -20L, 0L),
      ("a", 3L, 3L, 3L), ("a", 4L, -1L, 2L), ("b", 1L, -4L, 6L)))
  }

  test("clampedCumsum: same-slot ties fold in value order; guards fire") {
    // two deltas at slot 1 sort (-5, +7): 10-5=5 then 5+7=12 — NOT 10+7
    // clamped then -5 (which would give 10); value order is the contract
    val ev = Seq(("a", 1L, 7L), ("a", 1L, -5L)).toDF("k", "slot", "v")
    val got = TimeSeries.clampedCumsum(ev, "k", "slot", "v", 0L, 12L, 10L)
      .orderBy("balance")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, -5L, 5L), ("a", 1L, 7L, 12L)))

    intercept[IllegalArgumentException] {
      TimeSeries.clampedCumsum(ev, "k", "slot", "v", 0L, 10L, 11L)
    }
    val ex = intercept[Exception] {
      TimeSeries.clampedCumsum(ev, "k", "slot", "v", 0L, 12L, 10L,
        maxEventsPerKey = 1).collect()
    }
    assert(ex.getMessage.contains("exceeds 1"))
  }

  test("mannKendallTrend hand-computed: S=7, tie-corrected var, sen=1") {
    import spark.implicits._
    // v = [1,2,3,2,5] at t = 0..4: S = 7; ties: value 2 twice →
    // tie sum 18; var = (5·4·15 − 18)/18 = 282/18;
    // z = 6/sqrt(282/18); slopes sorted have both middles = 1
    val df = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (4L, 5L))
      .toDF("t", "v")
    val r = TimeSeries.mannKendallTrend(df, "t", "v", identity)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 10L, 7L)))
    assert(math.abs(r.getDouble(3) - 282.0 / 18.0) < 1e-12, r.toString)
    assert(math.abs(r.getDouble(4) - 6.0 / math.sqrt(282.0 / 18.0))
      < 1e-12, r.toString)
    assert(r.getDouble(5) === 1.0, r.toString)
  }

  test("mannKendallTrend: even-count median averages the middles; " +
      "monotone series has S = n_pairs") {
    import spark.implicits._
    // v = [1,2,4] at t = 0,1,2: slopes 1, 1.5, 2 → sen = 1.5; S = 3
    val df = Seq((0L, 1L), (1L, 2L), (2L, 4L)).toDF("t", "v")
    val r = TimeSeries.mannKendallTrend(df, "t", "v", identity)
      .collect().head
    assert(r.getLong(2) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(5) === 1.5, r.toString)
    // 4 points, 6 pairs: middles are ranks 3 and 4
    // v = [0,10,1,11] at t=0..3: slopes: 10, 0.5, 11/3, -9, 0.5, 10
    // sorted: -9, 0.5, 0.5, 10/3?? recompute: pairs (0,1)=10,
    // (0,2)=0.5, (0,3)=11/3, (1,2)=-9, (1,3)=0.5, (2,3)=10
    // sorted: -9, 0.5, 0.5, 11/3, 10, 10 → sen = (0.5 + 11/3)/2
    val df2 = Seq((0L, 0L), (1L, 10L), (2L, 1L), (3L, 11L)).toDF("t", "v")
    val r2 = TimeSeries.mannKendallTrend(df2, "t", "v", identity)
      .collect().head
    assert(math.abs(r2.getDouble(5) - (0.5 + 11.0 / 3.0) / 2.0) < 1e-12,
      r2.toString)
  }

  test("crossCorr hand-computed: r per lag, zero-variance lag is null") {
    import spark.implicits._
    // x=[1,2,3,4], y=[1,3,2,4]: lag0 r = 16/20 = 0.8;
    // lag1 pairs (1,3),(2,2),(3,4): r = 3/6 = 0.5
    val df = Seq((0L, 1L, 1L), (1L, 2L, 3L), (2L, 3L, 2L), (3L, 4L, 4L))
      .toDF("slot", "x", "y")
    val got = TimeSeries.crossCorr(df, "slot", "x", "y", maxLag = 2)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(got(0)._1 == 4L && math.abs(got(0)._2 - 0.8) < 1e-12)
    assert(got(1)._1 == 3L && math.abs(got(1)._2 - 0.5) < 1e-12)
    assert(got(2)._1 == 2L)
    // constant x → null r at every lag
    val flat = Seq((0L, 7L, 1L), (1L, 7L, 3L), (2L, 7L, 2L))
      .toDF("slot", "x", "y")
    val rows = TimeSeries.crossCorr(flat, "slot", "x", "y", 1).collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(2)))
  }

  test("crossCorr raises on duplicate slots; short lags drop") {
    import spark.implicits._
    val dup = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 3L, 3L))
      .toDF("slot", "x", "y")
    val e = intercept[Exception] {
      TimeSeries.crossCorr(dup, "slot", "x", "y", 1).collect()
    }
    assert(e.getMessage.contains("duplicate slot"), e.getMessage)
    // maxLag beyond the series: lags with < 2 overlaps are dropped
    val s3 = Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 3L, 3L))
      .toDF("slot", "x", "y")
    val lags = TimeSeries.crossCorr(s3, "slot", "x", "y", 5)
      .collect().map(_.getInt(0)).sorted
    assert(lags.toSeq == Seq(0, 1), lags.mkString(","))
  }

  test("mannKendallTrend raises on duplicate slots, short series, and " +
      "all-tied values") {
    import spark.implicits._
    val dup = Seq((0L, 1L), (0L, 2L), (1L, 3L)).toDF("t", "v")
    val e1 = intercept[Exception] {
      TimeSeries.mannKendallTrend(dup, "t", "v", identity).collect()
    }
    assert(e1.getMessage.contains("duplicate slot"), e1.getMessage)
    val short = Seq((0L, 1L), (1L, 2L)).toDF("t", "v")
    val e2 = intercept[Exception] {
      TimeSeries.mannKendallTrend(short, "t", "v", identity).collect()
    }
    assert(e2.getMessage.contains("at least 3"), e2.getMessage)
    val flat = Seq((0L, 5L), (1L, 5L), (2L, 5L)).toDF("t", "v")
    val e3 = intercept[Exception] {
      TimeSeries.mannKendallTrend(flat, "t", "v", identity).collect()
    }
    assert(e3.getMessage.contains("zero variance"), e3.getMessage)
  }

  test("hampel: a planted spike flags, its window median/MAD are the " +
      "hand values, null rows raise") {
    import spark.implicits._
    // series 10,10,10,100,10,10,10: the spike's +-3 window is the
    // whole series -> med 10, MAD 0 -> |100-10| > 3*0 flags; the
    // neighbors' windows also carry the spike but their own deviation
    // is 0, never > 0
    val rows = Seq(10, 10, 10, 100, 10, 10, 10).zipWithIndex
      .map { case (v, i) => ("u", i, v.toDouble) }
    val got = TimeSeries.hampel(rows.toDF("k", "t", "v"), "k",
      Seq("t"), "v", halfWin = 3).orderBy("t").collect()
    assert(got.count(_.getAs[Boolean]("is_outlier")) == 1)
    val spike = got(3)
    assert(spike.getAs[Boolean]("is_outlier") &&
      spike.getAs[Double]("med") == 10.0 &&
      spike.getAs[Double]("mad") == 0.0, spike.toString)
    // even-window median averages the two middles: first row's window
    // is rows 0..3 -> sorted (10,10,10,100), med = 10
    assert(got(0).getAs[Double]("med") == 10.0, got(0).toString)
    val e = intercept[Exception] {
      TimeSeries.hampel(Seq(("u", Some(1), Some(1.0)),
        ("u", Some(2), None)).toDF("k", "t", "v"), "k", Seq("t"), "v")
        .collect()
    }
    assert(e.getMessage.contains("NULL value/order"), e.getMessage)
  }

  test("durbinWatson: alternating residuals give DW near 4, a smooth " +
      "ramp plus one kink stays near 0; degenerates raise") {
    import spark.implicits._
    // y alternates +-1: residuals flip sign every step (the OLS slope
    // is small but nonzero — Σxy = 5 — so the exact DW is replicated
    // below with BigInt scaled residuals, the operator's own algebra)
    val n = 10
    val ys = (1 to n).map(i => if (i % 2 == 0) 1L else -1L)
    val alt = (1 to n).map(i => ("a", i, ys(i - 1)))
    val got = TimeSeries.durbinWatson(alt.toDF("g", "t", "y"), "g",
      Seq("t"), "y").collect().head
    assert(got.getLong(1) == n, got.toString)
    val (sx, sy) = ((1 to n).map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
    val sxx = (1 to n).map(i => BigInt(i) * i).sum
    val sxy = (1 to n).map(i => BigInt(i) * ys(i - 1)).sum
    val den = BigInt(n) * sxx - sx * sx
    val bNum = BigInt(n) * sxy - sx * sy
    val r = (1 to n).map(i => BigInt(n) * den * ys(i - 1) -
      den * sy + bNum * sx - BigInt(n) * bNum * i)
    val want = r.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0)))
      .sum.toDouble / r.map(e => e * e).sum.toDouble
    assert(got.getDouble(2) == want, s"got $got want $want")
    assert(got.getDouble(2) > 3.0, got.toString)
    // positively autocorrelated residuals (one level shift around the
    // fitted line) -> DW well below 2
    val shift = (1 to n).map(i => ("a", i, if (i <= n / 2) 0 else 10))
    val lo = TimeSeries.durbinWatson(shift.toDF("g", "t", "y"), "g",
      Seq("t"), "y").collect().head
    assert(lo.getDouble(2) < 1.8, lo.toString)
    val e1 = intercept[Exception] {
      TimeSeries.durbinWatson(Seq(("a", 1, 1), ("a", 2, 2))
        .toDF("g", "t", "y"), "g", Seq("t"), "y").collect()
    }
    assert(e1.getMessage.contains("smaller than 3"), e1.getMessage)
    val e2 = intercept[Exception] {
      TimeSeries.durbinWatson((1 to 5).map(i => ("a", i, 2 * i))
        .toDF("g", "t", "y"), "g", Seq("t"), "y").collect()
    }
    assert(e2.getMessage.contains("perfect linear fit"), e2.getMessage)
  }

  test("durbinWatson raises on decimal overflow from huge |y| instead " +
      "of silently returning NULL (sum() would skip overflowed " +
      "squares)") {
    import spark.implicits._
    // |y| ~ 1e16 keeps every scaled residual (~n·den·y ≈ 8e19) inside
    // DECIMAL(38) but its SQUARE (~7e39) overflows the (38,0)×(38,0)
    // product to NULL — pre-fix, sum() skipped the NULLs and dw came
    // back NULL (or silently wrong); the guard must raise
    val huge = (1 to 10).map(i =>
      ("a", i, if (i % 2 == 0) 10000000000000000L
        else -10000000000000000L))
    // under ANSI (this session's default) Spark itself raises on the
    // decimal product; the repo guard exists for ANSI-off consumers,
    // where the product silently NULLs — exercise BOTH postures
    val e = intercept[Exception] {
      TimeSeries.durbinWatson(huge.toDF("g", "t", "y"), "g",
        Seq("t"), "y").collect()
    }
    assert(e.getMessage.contains("overflowed DECIMAL(38)") ||
      e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
      e.getMessage)
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e2 = intercept[Exception] {
        TimeSeries.durbinWatson(huge.toDF("g", "t", "y"), "g",
          Seq("t"), "y").collect()
      }
      assert(e2.getMessage.contains("overflowed DECIMAL(38)"),
        e2.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
