package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the per-drill floor ratchet (r13 verdict #6: the 128×
  * tier's absolute Mrow/s was recorded once; DRILL_BEST.json gives it
  * the BENCH_BEST treatment). The suspect trigger is proven on a
  * perturbed input, per the verdict's own done-condition. */
class DrillFloorSpec extends AnyFunSuite {

  test("suspect trigger fires on a 3x-degraded drill and stays quiet " +
      "inside the margin") {
    val prior = Map("bm25@32x" -> 10.0, "lang_id@32x" -> 2.0)
    val results = Seq(
      ("bm25", 35.0), // 3.5x the floor: constant-factor decay
      ("lang_id", 5.9), // 2.95x: inside the margin
      ("new_drill", 7.0), // no floor yet: never suspect
      ("skipped", 0.0)) // filtered row: never suspect
    val flagged = ScaleBench.drillSuspects(prior, results, 32)
    assert(flagged.size == 1 && flagged.head.startsWith("bm25"),
      flagged.toString)
    // factor mismatch anchors to nothing: a 128x time must not be
    // judged against the 32x floor
    assert(ScaleBench.drillSuspects(prior, Seq(("bm25", 35.0)), 128)
      .isEmpty)
  }

  test("drill map round-trips and min-merges only downward") {
    val tmp = java.nio.file.Files.createTempFile("drill", ".json")
      .toString
    ScaleBench.writeDrillMap(Map("bm25@32x" -> 10.5, "pii_luhn@128x" ->
      44.25), tmp)
    val back = ScaleBench.readDrillMap(tmp)
    assert(back == Map("bm25@32x" -> 10.5, "pii_luhn@128x" -> 44.25))
    val merged = Bench.minMerge(back,
      Map("bm25@32x" -> 12.0, "pii_luhn@128x" -> 40.0, "new@8x" -> 1.0))
    assert(merged == Map("bm25@32x" -> 10.5, "pii_luhn@128x" -> 40.0,
      "new@8x" -> 1.0))
    java.nio.file.Files.delete(java.nio.file.Paths.get(tmp))
  }
}
