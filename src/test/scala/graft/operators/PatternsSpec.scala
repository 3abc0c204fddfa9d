package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Greedy non-overlapping subsequence matching on closed-form event
  * logs: counting, restarts, gap constraint, interleaved noise. */
class PatternsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Long) = new Timestamp(minute * 60000L)

  private def run(events: Seq[(String, Long, Long, String)],
      pattern: Seq[String], gapUs: Option[Long] = None,
      reAnchor: Boolean = false) =
    Patterns.matchSequence(
        events.toDF("u", "min", "id", "t")
          .selectExpr("u", "timestamp_millis(min * 60000) AS ts",
            "id", "t"),
        "u", "ts", "id", "t", pattern, gapUs, reAnchor)
      .select("u", "n_matches")
      .as[(String, Long)].collect().toMap

  test("subsequence with noise matches; greedy restart counts twice") {
    val ev = Seq(
      ("u1", 0L, 1L, "a"), ("u1", 1L, 2L, "x"), ("u1", 2L, 3L, "b"),
      ("u1", 3L, 4L, "a"), ("u1", 4L, 5L, "b"),
      ("u2", 0L, 6L, "b"), ("u2", 1L, 7L, "a")) // wrong order
    assert(run(ev, Seq("a", "b")) === Map("u1" -> 2L, "u2" -> 0L))
  }

  test("max gap between consecutive steps: late step is skipped, a " +
      "later in-gap occurrence still completes") {
    // a at 0; b at 100 (too late for 10-min gap); a at 200; b at 205 (ok)
    val ev = Seq(
      ("u", 0L, 1L, "a"), ("u", 100L, 2L, "b"),
      ("u", 200L, 3L, "a"), ("u", 205L, 4L, "b"))
    // NOTE: the greedy matcher holds step=1 from the first 'a'; the b@100
    // fails the gap, then a@200 is not 'b' so it is NOT consumed — the
    // matcher stays armed on the FIRST a, and b@205 is 205 min after it.
    // With gap 10 min nothing completes; unbounded, both a-b pairs do.
    assert(run(ev, Seq("a", "b"),
      Some(10L * 60 * 1000000)) === Map("u" -> 0L))
    assert(run(ev, Seq("a", "b")) === Map("u" -> 2L))
  }

  test("reAnchor: the stale-anchor restart case completes; default " +
      "greedy still misses it; spans stay non-overlapping") {
    val gap = Some(10L * 60 * 1000000) // 10 min
    // the ADVICE scenario: a@0 arms; a@200 arrives mid-pattern (not
    // consumed, remembered under reAnchor); b@205 fails the gap vs the
    // stale a@0 but fits a@200
    val ev = Seq(
      ("u", 0L, 1L, "a"), ("u", 200L, 2L, "a"), ("u", 205L, 3L, "b"))
    assert(run(ev, Seq("a", "b"), gap) === Map("u" -> 0L))
    assert(run(ev, Seq("a", "b"), gap, reAnchor = true) === Map("u" -> 1L))
    // latest start wins: a@0, a@100, a@200, b@205 — restart from a@200
    val ev2 = ("u", 100L, 9L, "a") +: ev
    assert(run(ev2, Seq("a", "b"), gap, reAnchor = true) === Map("u" -> 1L))
    // 3-step pattern: re-anchored match continues to completion
    val ev3 = Seq(
      ("u", 0L, 1L, "a"), ("u", 200L, 2L, "a"),
      ("u", 205L, 3L, "b"), ("u", 210L, 4L, "c"))
    assert(run(ev3, Seq("a", "b", "c"), gap) === Map("u" -> 0L))
    assert(run(ev3, Seq("a", "b", "c"), gap,
      reAnchor = true) === Map("u" -> 1L))
    // the remembered anchor clears on completion: a@0 b@5 completes,
    // the a@3 seen mid-match cannot seed an overlapping second match
    val ev4 = Seq(
      ("u", 0L, 1L, "a"), ("u", 3L, 2L, "a"), ("u", 5L, 3L, "b"),
      ("u", 30L, 4L, "b"))
    assert(run(ev4, Seq("a", "b"), gap, reAnchor = true) === Map("u" -> 1L))
    // reAnchor changes nothing when the primary never goes stale
    val ev5 = Seq(
      ("u", 0L, 1L, "a"), ("u", 1L, 2L, "x"), ("u", 2L, 3L, "b"),
      ("u", 3L, 4L, "a"), ("u", 4L, 5L, "b"))
    assert(run(ev5, Seq("a", "b"), gap, reAnchor = true) ===
      run(ev5, Seq("a", "b"), gap))
  }

  test("gap measured per step, not whole pattern") {
    // a@0, b@5, c@9: each consecutive gap <= 5 min, total 9 > 5
    val ev = Seq(("u", 0L, 1L, "a"), ("u", 5L, 2L, "b"), ("u", 9L, 3L, "c"))
    assert(run(ev, Seq("a", "b", "c"),
      Some(5L * 60 * 1000000)) === Map("u" -> 1L))
  }

  test("non-overlapping: aaa matches aa once") {
    val ev = Seq(("u", 0L, 1L, "a"), ("u", 1L, 2L, "a"), ("u", 2L, 3L, "a"))
    assert(run(ev, Seq("a", "a")) === Map("u" -> 1L))
  }

  test("last_match_ts is the completion time of the final match") {
    val ev = Seq(("u", 0L, 1L, "a"), ("u", 1L, 2L, "b"),
      ("u", 2L, 3L, "a"), ("u", 7L, 4L, "b"))
    val out = Patterns.matchSequence(
        ev.toDF("u", "min", "id", "t")
          .selectExpr("u", "timestamp_millis(min * 60000) AS ts",
            "id", "t"),
        "u", "ts", "id", "t", Seq("a", "b"))
      .collect().head
    assert(out.getAs[Long]("n_matches") === 2L)
    assert(out.getAs[Timestamp]("last_match_ts") === ts(7))
  }

  test("hot key fails loudly instead of materializing a giant row") {
    val hot = (1L to 50L).map(i => ("whale", i, i, "a")) ++
      Seq(("minnow", 1L, 100L, "a"))
    val df = hot.toDF("u", "min", "id", "t")
      .selectExpr("u", "timestamp_millis(min * 60000) AS ts", "id", "t")
    val ex = intercept[Exception] {
      Patterns.matchSequence(df, "u", "ts", "id", "t", Seq("a", "b"),
        maxEventsPerKey = 10).collect()
    }
    assert(ex.getMessage.contains("whale") &&
      ex.getMessage.contains("exceeds 10 events"))
    // under the cap the same log folds fine
    assert(Patterns.matchSequence(df, "u", "ts", "id", "t",
      Seq("a", "b"), maxEventsPerKey = 100).count() === 2L)
  }
}
