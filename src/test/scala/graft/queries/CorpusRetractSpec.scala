package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion/takedown propagation (q_corpus_retract, r14 verdict #1) on
  * a PLANTED corpus where every delete class is known by construction —
  * the delta path must hash-equal the from-scratch chain on
  * corpus ∖ retracted, including the two resurrection rules the
  * append-only incremental case never exercises:
  *
  *  - a retracted exact-dup KEEPER re-elects its next-smallest twin
  *  - a retracted near-dup CULPRIT resurrects the docs it alone doomed
  *  - ...but a victim whose culprit was retracted stays doomed when
  *    the culprit's RE-ELECTED exact twin still near-dups it (the
  *    re-elected keeper inherits the removed keeper's pair set)
  *  - a resurrected doc gets a fresh decontam verdict (it may be
  *    contaminated — resurrection at S3 must not skip S4) */
class CorpusRetractSpec extends SparkSpec {
  import spark.implicits._

  private def text(seed: String, n: Int = 24): String =
    (0 until n).map(i => s"${seed}tok$i").mkString(" ")

  /** Planted corpus covering every delete class. */
  private def corpus() = Seq(
    // bench doc: defines the decontam probe set (immovable)
    (0L, "en", text("bench")),
    // S1-dropped doc (wrong lang): retracting it is a no-op
    (10L, "zz", text("langout")),
    // exact-dup TRIPLE: keeper 21; retracting 21 re-elects 22 (not 23)
    (21L, "en", text("exact")),
    (22L, "en", text("exact")),
    (23L, "en", text("exact")),
    // near-dup pair: culprit 31 dooms 32; retracting 31 resurrects 32
    (31L, "de", text("near", 30)),
    (32L, "de", text("near", 30) + " neartok999"),
    // keeper-inheritance case: 50/51 exact dups, both near-dup 52 —
    // retracting 50 re-elects 51, and 52 must STAY doomed (by 51)
    (50L, "fr", text("fifty", 30)),
    (51L, "fr", text("fifty", 30)),
    (52L, "fr", text("fifty", 30) + " fiftytail1"),
    // contaminated resurrection: 61 dooms 62; 62 shares the bench
    // doc's 5-grams, so when 61 is retracted, 62 resurrects at S3 but
    // S4 must still reject it
    (61L, "en", text("conta", 30)),
    (62L, "en", text("conta", 30) + " " + text("bench")),
    // ORDERING case keeper < victim < twin: retracting 70 re-elects
    // 74, but the pair (72, 74) has 72 on the SMALLER side — 74
    // cannot doom 72 (canonical id1 < id2), so 72 resurrects and the
    // re-elected 74 is itself doomed by 72 at S3
    (70L, "de", text("order", 30)),
    (72L, "de", text("order", 30) + " ordertail1"),
    (74L, "de", text("order", 30)),
    // plain survivors, one of them retracted
    (200L, "en", text("cen")),
    (300L, "fr", text("cfr"))
  ).toDF("doc_id", "lang", "text")

  private def writeCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_retract").toString
    corpus().write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("delta retraction equals the from-scratch chain on every " +
      "planted delete class (keeper re-election, victim resurrection, " +
      "inherited dooming, contaminated resurrection, plain removal, " +
      "S1 no-op)") {
    val dir = writeCorpus()
    val retractIds = Seq(21L, 31L, 50L, 61L, 200L, 10L)
    val r = retractIds.toDF("doc_id")
    val got = PipelineQueries.corpusRetractFrom(spark, dir, r)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val want = PipelineQueries.corpusEnd2EndFrom(
        corpus().filter(!col("doc_id").isin(retractIds: _*)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(got == want, s"delta $got\nfrom-scratch $want")
    // pin the semantics, not just the equality: survivors are
    // 22 (re-elected twin), 32 (resurrected victim), 51, 70, 300 —
    // NOT 23 (22 is the smaller twin), NOT 52 (still doomed by the
    // re-elected 51), NOT 62 (resurrected but contaminated)
    val buckets = got.map(_._1)
    assert(buckets == Set(22L % 16, 32L % 16, 51L % 16, 70L % 16,
      300L % 16), s"buckets $buckets")
    assert(got.toSeq.map(_._2).sum == 5L, got.toString)
  }

  test("change ledger names every membership flip with its reason, " +
      "including the keeper < victim < twin ordering case") {
    val dir = writeCorpus()
    val retractIds = Seq(21L, 31L, 50L, 61L, 200L, 10L, 70L)
    val got = PipelineQueries.corpusRetractLedgerFrom(spark, dir,
        retractIds.toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    val want = Set(
      21L -> "removed_retracted", 31L -> "removed_retracted",
      50L -> "removed_retracted", 61L -> "removed_retracted",
      200L -> "removed_retracted", 70L -> "removed_retracted",
      // 10 was S1-dropped: no membership to change
      22L -> "resurrected_exact_twin", 51L -> "resurrected_exact_twin",
      32L -> "resurrected_neardup_victim",
      // 72's only culprit (70) left; the re-elected 74 pairs with 72
      // on the WRONG side (72 < 74) so it cannot re-doom it...
      72L -> "resurrected_neardup_victim"
      // ...and 74 itself (S2-re-elected but S3-doomed by 72) plus 62
      // (S3-resurrected but contaminated) and 52 (still doomed by 51)
      // never flip S4 membership — correctly absent
    )
    assert(got == want, s"got $got\nwant $want")
    // the manifest gate agrees with from-scratch under this bigger
    // retraction too (the ordering case flows through both)
    val manifest = PipelineQueries.corpusRetractFrom(spark, dir,
        retractIds.toDF("doc_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val scratch = PipelineQueries.corpusEnd2EndFrom(
        corpus().filter(!col("doc_id").isin(retractIds: _*)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(manifest == scratch, s"manifest $manifest\nscratch $scratch")
  }

  test("full lifecycle (append, compact, retract with artifact " +
      "rewrite, append) closes on the from-scratch corpus — incl. the " +
      "re-elected twin entering the signature index and fully-" +
      "retracted content becoming NEW again") {
    // max id 250 -> c1 = 84, c2 = 167: day-1 < 84, day-2 84..166,
    // day-3 >= 167; the registered takedown rule (id >= 5, id % 17 == 7)
    // hits 24 (exact keeper), 41 (near-dup culprit), 75 (sole carrier)
    val docs = Seq(
      (0L, "en", text("bench")),
      (24L, "en", text("exact")),  // retracted keeper
      (26L, "en", text("exact")),  // re-elected twin
      (40L, "en", text("cen")),
      (41L, "de", text("near", 30)), // retracted culprit
      (75L, "fr", text("gone")),     // retracted sole content carrier
      (111L, "zz", text("rej", 30)), // day-2 quality reject
      (130L, "de", text("near", 30) + " neartail1"), // 41's victim
      (150L, "de", text("cde")),
      // day-3 near-dup of the RE-ELECTED 26: caught ONLY if the
      // rewrite added 26's signature to the index
      (210L, "en", text("exact") + " exacttail1"),
      // day-3 exact copy: 26 still carries the digest -> dropped
      (220L, "en", text("exact")),
      // day-3 near-dup of the resurrected victim 130
      (230L, "de", text("near", 30) + " neartail1 neartail2"),
      (240L, "fr", text("cfr")),
      // 75 was the only carrier of "gone": after retraction the
      // content is NEW again and the day-3 copy must survive
      (250L, "fr", text("gone"))
    ).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lifecycle").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.corpusLifecycle(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val want = PipelineQueries.corpusEnd2EndFrom(
        docs.filter(!(col("doc_id") >= 5 && col("doc_id") % 17 === 7)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(got == want, s"lifecycle $got\nfrom-scratch $want")
    // survivors pinned: 26 (re-elected), 40, 130 (resurrected), 150,
    // 240, 250 (content reborn) — NOT 210 (doomed by 26's ADDED sig),
    // NOT 220 (digest still carried by 26), NOT 230 (doomed by 130)
    assert(got.toSeq.map(_._2).sum == 6L, got.toString)
    assert(got.map(_._1) == Set(26L % 16, 40L % 16, 130L % 16,
      150L % 16, 240L % 16, 250L % 16), got.toString)
  }

  test("retracting nothing reproduces the batch manifest; retracting " +
      "a benchmark doc raises loudly") {
    val dir = writeCorpus()
    val none = Seq.empty[Long].toDF("doc_id")
    val got = PipelineQueries.corpusRetractFrom(spark, dir, none)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val want = PipelineQueries.corpusEnd2EndFrom(corpus())
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(got == want, s"noop delta $got\nbatch $want")
    val e = intercept[Exception] {
      PipelineQueries.corpusRetractFrom(spark, dir,
        Seq(0L).toDF("doc_id")).collect()
    }
    assert(e.getMessage.contains("benchmark doc"), e.getMessage)
  }
}
