package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-place amendment (q_corpus_amend, r16 verdict #2) on a PLANTED
  * corpus where every UPDATE class is known by construction — the
  * atomic upsert delta must hash-equal the from-scratch chain on the
  * amended corpus, including the insert-side flips a pure retraction
  * never exercises:
  *
  *  - an amendment to sub-quality text IS a takedown (old victims
  *    resurrect, nothing re-enters)
  *  - an amended doc whose new text EQUALS an at-rest doc's STEALS its
  *    exact-dedup keepership (smaller id wins); the displaced keeper's
  *    near-dup victims stay doomed through the new keeper's inherited
  *    pairs (identical text ⇒ identical pair set, smaller id)
  *  - new near-dup content dooms a previously-clean LARGER-id doc and
  *    is itself doomed by a SMALLER-id at-rest partner
  *  - the cluster-migration twin: ONE amendment resurrects its old
  *    content's victim AND dooms a clean doc near its new content
  *  - an amended keeper's exact twins re-elect (the retraction rule,
  *    triggered by an update)
  *  - amended text re-entering cleanly gets FRESH decontam + n_tokens
  *    (prior S3 membership of the id proves nothing about new text) */
class CorpusAmendSpec extends SparkSpec {
  import spark.implicits._

  private def text(seed: String, n: Int = 24): String =
    (0 until n).map(i => s"${seed}tok$i").mkString(" ")

  private def corpus() = Seq(
    // bench doc: defines the decontam probe set (immovable)
    (0L, "en", text("bench")),
    // exact triple: amending keeper 21 re-elects 22 (not 23)
    (21L, "en", text("exact")),
    (22L, "en", text("exact")),
    (23L, "en", text("exact")),
    // STEAL case: 80 keeps text E and dooms 90; amending 60 -> E steals
    // the keepership (60 < 80), 80 dies at S2, 90 stays doomed (by 60's
    // inherited pair)
    (60L, "en", text("sixty", 30)),
    (80L, "en", text("steal", 30)),
    (90L, "en", text("steal", 30) + " stealtail1"),
    // near-dup doom both directions: 110 -> N+tail dooms clean 120;
    // 130 -> N+tail2 is doomed BY the at-rest 120 (and by 110)
    (110L, "de", text("onet", 24)),
    (120L, "de", text("ndoom", 30)),
    (130L, "de", text("onet2", 24)),
    // cluster migration: 150's old text dooms 155; its new text lands
    // near 160 — one amendment resurrects 155 AND dooms 160
    (150L, "fr", text("mold", 30)),
    (155L, "fr", text("mold", 30) + " moldtail1"),
    (160L, "fr", text("qdon", 30)),
    // clean re-entry and contaminated re-entry
    (300L, "en", text("c300")),
    (310L, "fr", text("c310")),
    // amendment-as-takedown: 200's stub fails quality, victim 205
    // resurrects
    (200L, "en", text("c200", 30)),
    (205L, "en", text("c200", 30) + " tailx1")
  ).toDF("doc_id", "lang", "text")

  private def amendments() = Seq(
    // short seeds: the quality gate rejects >= 12 chars/token, and
    // "fresh21tokNN" averages 12.7 — which would silently turn these
    // re-entries into takedowns (found the hard way)
    (21L, "en", text("f21", 40)),
    (60L, "en", text("steal", 30)),
    (110L, "de", text("ndoom", 30) + " ndtail1"),
    (130L, "de", text("ndoom", 30) + " ndtail2 ndtailx"),
    (150L, "fr", text("qdon", 30) + " zqtail1"),
    (300L, "en", text("n300", 25)),
    (310L, "fr", text("c310b", 22) + " " + text("bench")),
    (200L, "en", "amended takedown stub")
  ).toDF("doc_id", "lang", "text")

  test("atomic amendment equals the from-scratch chain on every " +
      "planted update class (takedown, keeper steal, near-dup doom in " +
      "both directions, cluster migration, twin re-election, clean and " +
      "contaminated re-entry)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_amend").toString
    corpus().write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.corpusAmendFrom(spark, dir, amendments())
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val amendedCorpus = corpus().as("d")
      .join(amendments().select(col("doc_id"),
        col("text").as("__new")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("__new"), col("text")).as("text"))
    val want = PipelineQueries.corpusEnd2EndFrom(amendedCorpus)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(got == want, s"delta $got\nfrom-scratch $want")
    // pin the semantics: survivors are 21 (fresh text), 22 (re-elected
    // twin), 60 (the thief), 110 (new near-dup culprit), 150 (migrated
    // cluster), 155 (resurrected victim), 205 (takedown victim), 300
    // (clean re-entry) — NOT 80 (stolen keeper), NOT 90 (inherited
    // doom), NOT 120/160 (newly doomed clean docs), NOT 130 (doomed
    // amendment), NOT 310 (contaminated re-entry), NOT 200 (failed
    // quality), NOT 23 (22 is the smaller twin)
    val survivors = Set(21L, 22L, 60L, 110L, 150L, 155L, 205L, 300L)
    assert(got.map(_._1) == survivors.map(_ % 16), got.toString)
    assert(got.toSeq.map(_._2).sum == survivors.size.toLong, got.toString)
  }

  test("amendment change ledger names every flip with its reason — " +
      "ONE event per amendment, never a takedown plus a new doc") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_amend_ledger").toString
    corpus().write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.corpusAmendLedgerFrom(spark, dir,
        amendments())
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    val want = Set(
      // re-crawled content now serving (21 also re-elects its twin)
      21L -> "amended_in_corpus", 60L -> "amended_in_corpus",
      110L -> "amended_in_corpus", 150L -> "amended_in_corpus",
      300L -> "amended_in_corpus",
      // new content fails: near-dup-doomed / contaminated / sub-quality
      130L -> "removed_amended", 310L -> "removed_amended",
      200L -> "removed_amended",
      // collateral: stolen keepership and fresh near-dup dooms
      80L -> "removed_displaced", 120L -> "removed_displaced",
      160L -> "removed_displaced",
      // the dead content's displaced docs return
      22L -> "resurrected_exact_twin",
      155L -> "resurrected_neardup_victim",
      205L -> "resurrected_neardup_victim"
      // 90 stays doomed through the thief's inherited pair — no flip;
      // 23 stays doomed by the re-elected 22 — correctly absent
    )
    assert(got == want, s"got $got\nwant $want")
  }

  test("empty amendment set reproduces the batch manifest; amending a " +
      "benchmark doc raises loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_amend_noop").toString
    corpus().write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PipelineQueries.corpusAmendFrom(spark, dir,
        Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    val want = PipelineQueries.corpusEnd2EndFrom(corpus())
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    assert(got == want)
    val ex = intercept[IllegalArgumentException] {
      PipelineQueries.corpusAmendFrom(spark, dir,
        Seq((0L, "en", text("hijack"))).toDF("doc_id", "lang", "text"))
        .collect()
    }
    assert(ex.getMessage.contains("benchmark"), ex.getMessage)
  }
}
