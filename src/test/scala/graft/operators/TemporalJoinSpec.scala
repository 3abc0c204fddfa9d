package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Point-in-time join semantics against a closed-form SCD2 fixture:
  * interval containment, half-open vs closed end conventions, deleted
  * entities, pre-history probes, unknown and null keys. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  // key A: three contiguous versions [1,2) [2,5) [5,null);
  // key B: one version [1,3) then deleted (no successor run)
  private val dim = Seq(
    ("A", 1L, Some(2L), "a1"),
    ("A", 2L, Some(5L), "a2"),
    ("A", 5L, None, "a3"),
    ("B", 1L, Some(3L), "b1")
  ).toDF("k", "valid_from", "valid_to_opt", "payload")
    .select(col("k"), col("valid_from"),
      col("valid_to_opt").as("valid_to"), col("payload"))

  private def run(facts: Seq[(String, Long)], inclusiveEnd: Boolean) =
    TemporalJoin.pointInTime(
        facts.toDF("k", "t"), dim, "k", "t",
        "valid_from", "valid_to", Seq("payload"), inclusiveEnd)
      .select("k", "t", "asof_payload")
      .as[(String, Long, Option[String])].collect().toSet

  test("half-open [from, to): containment, expiry, pre-history, deletes") {
    val got = run(Seq(
      ("A", 0L), ("A", 1L), ("A", 2L), ("A", 4L), ("A", 5L), ("A", 100L),
      ("B", 2L), ("B", 3L), ("C", 1L)), inclusiveEnd = false)
    assert(got === Set(
      ("A", 0L, None),        // before the first version
      ("A", 1L, Some("a1")),
      ("A", 2L, Some("a2")),  // boundary: to is EXCLUSIVE, from inclusive
      ("A", 4L, Some("a2")),
      ("A", 5L, Some("a3")),
      ("A", 100L, Some("a3")), // open-ended current version
      ("B", 2L, Some("b1")),
      ("B", 3L, None),        // deleted at 3: no successor run
      ("C", 1L, None)))       // unknown key
  }

  test("closed [from, to] (scd2's last-observed convention) shifts only " +
      "the end boundary") {
    val got = run(Seq(("A", 2L), ("B", 3L), ("B", 4L)), inclusiveEnd = true)
    // A@2: both a1 (to=2 inclusive) and a2 (from=2) would contain 2 under
    // the closed convention — the as-of rule resolves to the LATEST
    // starting interval, a2, which is the SCD2-correct reading (version 2
    // is what was observed at time 2)
    assert(got === Set(
      ("A", 2L, Some("a2")),
      ("B", 3L, Some("b1")),  // inclusive end keeps the last version live
      ("B", 4L, None)))
  }

  test("matched interval bounds are carried; unmatched rows are all-null") {
    val out = TemporalJoin.pointInTime(
        Seq(("A", 4L), ("B", 3L)).toDF("k", "t"), dim, "k", "t",
        "valid_from", "valid_to", Seq("payload"))
      .select("k", "asof_valid_from", "asof_valid_to", "asof_payload")
      .as[(String, Option[Long], Option[Long], Option[String])]
      .collect().map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    assert(out("A") === ((Some(2L), Some(5L), Some("a2"))))
    assert(out("B") === ((None, None, None)))
  }

  test("null fact keys never match") {
    val facts = Seq((Some("A"), 1L), (None: Option[String], 1L))
      .toDF("k", "t")
    val got = TemporalJoin.pointInTime(facts, dim, "k", "t",
        "valid_from", "valid_to", Seq("payload"))
      .select("k", "asof_payload")
      .as[(Option[String], Option[String])].collect().toSet
    assert(got === Set(
      (Some("A"), Some("a1")), (None, None)))
  }

  test("validity columns may not repeat in carry") {
    intercept[IllegalArgumentException] {
      TemporalJoin.pointInTime(Seq(("A", 1L)).toDF("k", "t"), dim,
        "k", "t", "valid_from", "valid_to", Seq("valid_to"))
    }
  }
}
