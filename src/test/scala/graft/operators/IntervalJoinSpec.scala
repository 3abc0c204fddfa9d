package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucket decomposition must be LOSSLESS: the join's output equals the
  * naive theta-join, pair for pair, for bucket widths far smaller and
  * far larger than the interval length. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    l.crossJoin(r)
      .filter(unix_micros(col("ls")) < unix_micros(col("re")) &&
        unix_micros(col("rs")) < unix_micros(col("le")))
      .select(col("lid"), col("rid"),
        (least(unix_micros(col("le")), unix_micros(col("re"))) -
          greatest(unix_micros(col("ls")), unix_micros(col("rs"))))
          .as("overlap_us"))

  test("equals the naive theta join on real event windows, any width") {
    val ev = graft.sources.Tables.events(spark, sf)
    def win(t: String, a: String, b: String, c: String) =
      ev.filter(col("event_type") === t)
        .select(col("event_id").as(a), col("ts").as(b),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as(c))
    val l = win("error", "lid", "ls", "le")
    val r = win("purchase", "rid", "rs", "re")
    val want = naive(l, r)
    for (widthSec <- Seq(60L, 3600L, 86400L * 40)) {
      val got = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
          r, "rid", "rs", "re", widthSec)
        .select("l_id", "r_id", "overlap_us")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"bucketed join diverged from theta join at width=$widthSec s")
    }
  }

  test("touching intervals do not overlap; empty intervals never pair") {
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00")),
      (2L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))) // empty
      .toDF("lid", "ls", "le")
    val r = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")), // touch
      (11L, ts("2024-01-01 00:59:59"), ts("2024-01-01 03:00:00")), // 1s ov
      (12L, ts("2024-01-01 04:30:00"), ts("2024-01-01 05:30:00")))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", 600)
      .select("l_id", "r_id", "overlap_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 11L, 1000000L)))
  }

  test("two-tier split is output-invisible on a heavy-tailed mix") {
    val ev = graft.sources.Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("lid"), col("ts").as("ls"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("le"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("ts").as("rs"),
        when(col("event_id") % 20 === 0,
          col("ts") + expr("INTERVAL 24 HOURS"))
          .otherwise(col("ts") + expr("INTERVAL 10 MINUTES")).as("re"))
    val want = naive(l, r)
    val got = IntervalJoin.overlapJoinTwoTier(l, "lid", "ls", "le",
        r, "rid", "rs", "re", bucketWidthSec = 3600,
        longThresholdSec = 3600)
      .select("l_id", "r_id", "overlap_us")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("interval spanning many buckets pairs once, exact overlap") {
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
      .toDF("lid", "ls", "le") // 48h, hundreds of 600s buckets
    val r = Seq((9L, ts("2024-01-02 12:00:00"), ts("2024-01-04 00:00:00")))
      .toDF("rid", "rs", "re")
    val got = IntervalJoin.overlapJoin(l, "lid", "ls", "le",
        r, "rid", "rs", "re", 600)
      .select("l_id", "r_id", "overlap_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 9L, 12L * 3600 * 1000000L)))
  }

  test("mergeIntervals: islands over longs — overlap, touch, gap, keys") {
    // key a: [1,5] [5,9] touch-merge; [12,14] separate; contained [2,3]
    // key b: single interval
    val iv = Seq(("a", 1L, 5L), ("a", 5L, 9L), ("a", 2L, 3L),
      ("a", 12L, 14L), ("b", 4L, 6L))
      .toDF("k", "s", "e").repartition(3)
    val got = IntervalJoin.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("k", "island_start")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 9L, 3L), ("a", 12L, 14L, 1L),
      ("b", 4L, 6L, 1L)))
  }

  test("mergeIntervals: an earlier LONG interval bridges later ones") {
    // [0,100] swallows [10,20] and [30,40]: the running-max (not lag)
    // must carry the long end across — the classic gaps/islands trap
    val iv = Seq((1L, 0L, 100L), (1L, 10L, 20L), (1L, 30L, 40L),
      (1L, 150L, 160L)).toDF("k", "s", "e")
    val got = IntervalJoin.mergeIntervals(iv, Seq("k"), "s", "e")
      .orderBy("island_start")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 100L, 3L), (1L, 150L, 160L, 1L)))
  }

  test("mergeIntervals: reversed interval fails loudly") {
    val iv = Seq((1L, 10L, 5L)).toDF("k", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.mergeIntervals(iv, Seq("k"), "s", "e").collect()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("end < start"))
  }
}
