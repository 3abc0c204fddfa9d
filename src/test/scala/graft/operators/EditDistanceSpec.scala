package graft.operators

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  // 20+ chars so the 16-char prefix bucket is meaningful
  private val base = "the quick brown fox jumps over the lazy dog"

  test("finds suffix edits within maxDist, rejects beyond") {
    val docs = Seq(
      (1L, base),
      (2L, base + " xx"),          // dist 3 from 1
      (3L, base + " xxxxxxxxxx"),  // dist 11 from 1 (> maxDist AND len filter)
      (4L, "completely different text about something else entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistanceNearDup(docs, "doc_id", "text",
        maxDist = 5)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 3)))
  }

  test("prefix-edited pairs are out of contract (documented blocker gap)") {
    val docs = Seq(
      (1L, base),
      (2L, "Xhe quick brown fox jumps over the lazy dog") // 1 edit, in prefix
    ).toDF("doc_id", "text")
    // distance 1, but the edit falls inside the 16-char blocking prefix —
    // the pair is not a candidate; this asserts the DOCUMENTED recall
    // boundary rather than silently over-claiming
    assert(Dedup.editDistanceNearDup(docs, "doc_id", "text", maxDist = 5)
      .isEmpty)
    // a shorter blocking prefix that clears the edit recovers the pair
    assert(Dedup.editDistanceNearDup(docs, "doc_id", "text", maxDist = 5,
      prefixLen = 1).isEmpty) // first char differs: still blocked
  }

  test("maxBucket drops degenerate buckets instead of going quadratic") {
    val boiler = (1L to 50L).map(i => (i, base + " " + i))
    val docs = boiler.toDF("doc_id", "text")
    // bucket of 50 identical prefixes > maxBucket 10: dropped entirely
    assert(Dedup.editDistanceNearDup(docs, "doc_id", "text",
      maxDist = 5, maxBucket = 10).isEmpty)
    // raised cap: pairs flow (e.g. "... 1" vs "... 2" is distance 1)
    assert(Dedup.editDistanceNearDup(docs, "doc_id", "text",
      maxDist = 2, maxBucket = 100).count() > 0)
  }
}
