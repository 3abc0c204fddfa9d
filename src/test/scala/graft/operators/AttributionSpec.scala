package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Position-based attribution: hand-built journeys pin first/last/assist
  * credit, window edges, tie-breaks, and journeys with no touches. */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(rows: Seq[(Long, String, Timestamp, Long)]) =
    Attribution.positionCounts(
        rows.toDF("user_id", "event_type", "ts", "event_id")
          .repartition(3),
        "user_id", "event_type", "ts", "event_id",
        conversionType = "purchase",
        touchTypes = Seq("click", "view"), lookbackDays = 3)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("first/last/assists on a three-touch journey") {
    // user 1: view → click → view → purchase (all inside 3 days)
    val got = run(Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-02 10:00:00"), 2L),
      (1L, "view", ts("2024-01-03 10:00:00"), 3L),
      (1L, "purchase", ts("2024-01-03 12:00:00"), 4L)))
    // first = the 01-01 view, last = the 01-03 view, click assists only
    assert(got == Map(
      "view" -> ((1L, 1L, 2L, 1L)),
      "click" -> ((0L, 0L, 1L, 1L))))
  }

  test("window edges: too-old and same-instant touches excluded") {
    val got = run(Seq(
      (1L, "view", ts("2024-01-01 09:59:59"), 1L), // > 3 days before
      (1L, "click", ts("2024-01-03 10:00:00"), 2L), // inside
      (1L, "view", ts("2024-01-04 10:00:00"), 3L), // == conv ts: excluded
      (1L, "purchase", ts("2024-01-04 10:00:00"), 4L)))
    assert(got == Map("click" -> ((1L, 1L, 1L, 1L))))
  }

  test("simultaneous touches tie-break on event id; users independent") {
    val got = run(Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 5L),
      (1L, "click", ts("2024-01-01 10:00:00"), 6L), // same ts, higher id
      (1L, "purchase", ts("2024-01-02 10:00:00"), 7L),
      (2L, "click", ts("2024-01-01 10:00:00"), 8L),
      (2L, "purchase", ts("2024-01-02 10:00:00"), 9L)))
    // user 1: first = view (id 5), last = click (id 6)
    assert(got == Map(
      "view" -> ((1L, 0L, 1L, 1L)),
      "click" -> ((1L, 2L, 2L, 2L))))
  }

  test("conversions without touches contribute nothing; one touch may serve two conversions") {
    val got = run(Seq(
      (1L, "purchase", ts("2024-01-10 10:00:00"), 1L), // bare conversion
      (2L, "click", ts("2024-01-01 10:00:00"), 2L),
      (2L, "purchase", ts("2024-01-02 10:00:00"), 3L),
      (2L, "purchase", ts("2024-01-03 10:00:00"), 4L)))
    // the one click is first AND last for BOTH of user 2's purchases
    assert(got == Map("click" -> ((2L, 2L, 2L, 2L))))
  }
}
