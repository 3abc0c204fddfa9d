package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming takedowns (q_stream_retract, r16 verdict #3): retraction
  * events replayed as micro-batches against the at-rest membership
  * frames must land on the SAME manifest as one batch retraction of
  * the union — in EITHER batch order (retractions commute because each
  * delta step reproduces the from-scratch state of the remaining
  * corpus, and set subtraction commutes). The planted corpus reuses
  * CorpusRetractSpec's delete classes so the stream path exercises
  * keeper re-election, victim resurrection and inherited dooming
  * ACROSS batch boundaries: batch 1 retracts the keeper whose twin
  * re-elects, batch 2 retracts that re-elected twin — the second
  * delta must see the first's rewritten frames, not the originals. */
class StreamRetractSpec extends SparkSpec {
  import spark.implicits._

  private def text(seed: String, n: Int = 24): String =
    (0 until n).map(i => s"${seed}tok$i").mkString(" ")

  private def corpus() = Seq(
    (0L, "en", text("bench")),
    // exact triple: batch 1 retracts keeper 21 (22 re-elects), batch 2
    // retracts the re-elected 22 (23 re-elects) — the chained
    // re-election only works if batch 2 reads batch 1's rewrite
    (21L, "en", text("exact")),
    (22L, "en", text("exact")),
    (23L, "en", text("exact")),
    // near-dup: 31 dooms 32; retracting 31 (batch 2) resurrects 32
    (31L, "de", text("near", 30)),
    (32L, "de", text("near", 30) + " neartok999"),
    // keeper-inheritance: retracting 50 re-elects 51; 52 stays doomed
    (50L, "fr", text("fifty", 30)),
    (51L, "fr", text("fifty", 30)),
    (52L, "fr", text("fifty", 30) + " fiftytail1"),
    (200L, "en", text("cen")),
    (300L, "fr", text("cfr"))
  ).toDF("doc_id", "lang", "text")

  test("streamed takedown batches land on the single-shot union " +
      "retraction, in both batch orders (chained re-election included)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sretract_spec").toString
    corpus().write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batches = Seq(Seq(21L, 200L), Seq(22L, 31L), Seq(50L))
    def manifest(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .toSet
    val streamed = manifest(
      StreamOps.streamRetractFrom(spark, dir, batches))
    val reversed = manifest(
      StreamOps.streamRetractFrom(spark, dir, batches.reverse))
    val union = batches.flatten
    val singleShot = manifest(
      graft.queries.PipelineQueries.corpusRetractFrom(spark, dir,
        union.toDF("doc_id")))
    val fromScratch = manifest(
      graft.queries.PipelineQueries.corpusEnd2EndFrom(
        corpus().filter(!col("doc_id").isin(union: _*))))
    assert(streamed == fromScratch, s"streamed $streamed\nwant $fromScratch")
    assert(reversed == fromScratch, s"reversed $reversed\nwant $fromScratch")
    assert(singleShot == fromScratch)
    // pin: survivors are 23 (second re-election), 32 (resurrected),
    // 51 (re-elected), 300 — NOT 52 (still doomed by 51)
    assert(streamed.map(_._1) == Set(23L, 32L, 51L, 300L).map(_ % 16),
      streamed.toString)
  }
}
