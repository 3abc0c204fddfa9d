package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zone-map skipping must be lossless (≡ the plain range filter) while
  * actually reading fewer files than the layout holds. */
class ZoneMapSpec extends SparkSpec {

  test("pruned read ≡ full-table range filter, for ranges across the " +
      "layout, at the edges, and past the domain") {
    val full = Tables.events(spark, sf)
    for ((lo, hi) <- Seq((40L, 59L), (0L, 5L), (149L, 149L),
        (1000L, 2000L))) {
      val got = Layout.zoneMapPrunedEvents(spark, sf, lo, hi)
        .select("event_id")
      val want = full.filter(col("user_id").between(lo, hi))
        .select("event_id")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"zone-map pruning diverged on [$lo, $hi]")
    }
  }

  test("a narrow range plans fewer files than the layout holds") {
    val dir = Layout.clusteredEventsDir(spark, sf)
    val zm = spark.read.parquet(s"$dir/zonemap")
    val total = zm.count()
    val touched = zm.filter(col("mn") <= 45L && col("mx") >= 40L).count()
    assert(total > 1, "layout should hold multiple files")
    assert(touched < total,
      s"narrow range touched $touched of $total files — no skipping")
  }
}
