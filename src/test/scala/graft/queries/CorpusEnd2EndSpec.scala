package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The composed training-data chain (q_corpus_end2end, round-13
  * verdict #3) on a PLANTED corpus where every stage's effect is known
  * by construction — the cross-stage contract check the per-stage
  * gates can't perform. */
class CorpusEnd2EndSpec extends SparkSpec {
  import spark.implicits._

  // A word soup with >= 20 distinct tokens so the quality gate keeps it
  // and the 3-shingle set is rich; seedable so docs are token-disjoint.
  private def text(seed: String, n: Int = 24): String =
    (0 until n).map(i => s"${seed}tok$i").mkString(" ")

  test("each stage drops exactly the planted rows; the manifest " +
      "carries the final set") {
    val docs = Seq(
      // bench doc (id < 5): leaves the corpus AND contaminates id 100
      (0L, "en", text("bench")),
      // quality rejects: wrong lang / too short / bloated chars-per-tok
      (10L, "zz", text("langout")),
      (11L, "en", "short text only"),
      (12L, "en", (0 until 24).map(i => "x" * 13 + i).mkString(" ")),
      // exact-dup pair: 21 survives (min id), 22 drops
      (21L, "en", text("exact")),
      (22L, "en", text("exact")),
      // near-dup pair (Jaccard > 0.6 via shared prefix): 31 survives
      (31L, "de", text("near", 30)),
      (32L, "de", text("near", 30) + " neartok999"),
      // contaminated: shares the bench doc's 5-grams
      (100L, "en", text("bench") + " extra1 extra2 extra3 extra4 " +
        "extra5 extra6 extra7 extra8 extra9 extra10"),
      // clean survivors
      (200L, "en", text("cen")),
      (300L, "fr", text("cfr"))
    ).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("src0"))

    val manifest = PipelineQueries.corpusEnd2EndFrom(docs)
    val total = manifest.agg(sum("n_rows")).collect().head.getLong(0)
    // survivors: 21 (exact keep), 31 (near-dup keep), 200, 300
    assert(total == 4L, manifest.collect().mkString("\n"))
    val buckets = manifest.select("bucket").as[Long].collect().toSet
    // survivors' ids mod 16
    assert(buckets == Set(21L % 16, 31L % 16, 200L % 16, 300L % 16),
      buckets.toString)
    assert(manifest.filter(col("digest") === 0).count() == 0)
  }

  test("drop ledger: every dropped doc appears ONCE at its first " +
      "dropping stage with the right reason and culprit; ledger + " +
      "survivors partition the corpus") {
    val docs = Seq(
      (0L, "en", text("bench")),
      (10L, "zz", text("langout")),
      (11L, "en", "short text only"),
      (12L, "en", (0 until 24).map(i => "x" * 13 + i).mkString(" ")),
      (21L, "en", text("exact")),
      (22L, "en", text("exact")),
      (31L, "de", text("near", 30)),
      (32L, "de", text("near", 30) + " neartok999"),
      // shares 22 of its 32 trigrams with the bench doc: J = 0.6875,
      // so it falls to the NEAR-DUP stage (culprit 0), not decontam —
      // the first-dropping-stage discipline under test
      (100L, "en", text("bench") + " extra1 extra2 extra3 extra4 " +
        "extra5 extra6 extra7 extra8 extra9 extra10"),
      (200L, "en", text("cen")),
      (300L, "fr", text("cfr"))
    ).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("src0"))

    val got = PipelineQueries.corpusDropLedgerFrom(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    val want = Map(
      10L -> (("s1_quality", "lang_filtered", None)),
      11L -> (("s1_quality", "token_count", None)),
      12L -> (("s1_quality", "chars_per_token", None)),
      22L -> (("s2_exact_dup", "exact_duplicate", Some(21L))),
      32L -> (("s3_near_dup", "jaccard_near_duplicate", Some(31L))),
      100L -> (("s3_near_dup", "jaccard_near_duplicate", Some(0L))),
      0L -> (("s4_decontam", "benchmark_doc", None)))
    assert(got == want, s"got $got")
    // partition property: ledger ids + manifest survivors = all ids
    val manifest = PipelineQueries.corpusEnd2EndFrom(docs)
    val nSurv = manifest.agg(sum("n_rows")).collect().head.getLong(0)
    assert(got.size + nSurv == docs.count(),
      s"${got.size} dropped + $nSurv kept != ${docs.count()}")
  }

  test("mixing quotas bind: an over-quota language is cut to " +
      "floor(w * budget) deterministically") {
    // 70 distinct clean en docs -> quota 60 must bind; de/fr empty
    val docs = (0 until 70).map(i =>
        (1000L + i, "en", text(s"doc$i"))).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("src0"))
    val manifest = PipelineQueries.corpusEnd2EndFrom(docs)
    val total = manifest.agg(sum("n_rows")).collect().head.getLong(0)
    assert(total == 60L, s"expected the en quota 60, got $total")
  }

  test("packing chunk ids in the manifest shift when a size changes " +
      "(cross-stage drift IS visible in the digest)") {
    val base = (0 until 8).map(i =>
        (2000L + i, "fr", text(s"p$i"))).toDF("doc_id", "lang", "text")
      .withColumn("n_chars", length(col("text")))
      .withColumn("source", lit("src0"))
    val a = PipelineQueries.corpusEnd2EndFrom(base).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // same ids, one doc grows by 300 tokens -> later chunk ids shift,
    // so at least one shared bucket's digest must differ
    val grown = base.withColumn("text",
      when(col("doc_id") === 2000L,
        concat(col("text"), lit(" "), lit(text("grow", 300))))
        .otherwise(col("text")))
    val b = PipelineQueries.corpusEnd2EndFrom(grown).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a.keySet == b.keySet && a != b,
      s"digest did not register the packing shift: $a vs $b")
  }
}
