package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition / duplication quality signals over a text corpus — the
  * Gopher-style "repetitious document" filters and the RefinedWeb-style
  * corpus-level duplicated-span fraction every LLM data pipeline applies
  * before training.
  *
  * Scale shapes:
  *  - [[signals]]: the duplicate-n-gram fractions are pure per-row
  *    projections (no shuffle at all); the top-bigram share
  *    partial-aggregates on (doc, 64-bit gram hash), so no gram STRING
  *    ever enters an exchange.
  *  - [[dupSpanFraction]]: runs on the native
  *    [[graft.functions.NgramHashes]] byte-range kernel (the
  *    decontamination kernel) — spans shuffle as 8-byte hashes, text
  *    never leaves the scan.
  */
object Repetition {

  private def toks(text: Column): Column = split(lower(text), " ")

  /** Word n-grams (single-space tokenization, mirroring the DuckDB
    * oracle's `string_split`); empty for docs shorter than `n` tokens. */
  private def grams(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - n + 1),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Within-doc repetition signals per doc:
    *  - `dup_bigram_frac` / `dup_trigram_frac`: fraction of the doc's
    *    n-grams that repeat an earlier n-gram (1 − distinct/total);
    *  - `top_bigram_frac`: share of the single most frequent bigram;
    *  - `keep`: both configured thresholds respected — the filter bit a
    *    pipeline anti-joins on.
    */
  def signals(df: DataFrame, idCol: String, textCol: String,
      maxDupBigramFrac: Double = 0.3, maxTopBigramFrac: Double = 0.2)
      : DataFrame = {
    val t = toks(col(textCol))
    val base = df.select(col(idCol).as("doc_id"),
      grams(t, 2).as("g2"), grams(t, 3).as("g3"))
    def dupFrac(g: Column): Column =
      when(size(g) > 0,
        round(lit(1) - size(array_distinct(g)).cast("double") / size(g), 6))
        .otherwise(lit(0.0))
    val inRow = base.select(col("doc_id"),
      dupFrac(col("g2")).as("dup_bigram_frac"),
      dupFrac(col("g3")).as("dup_trigram_frac"))
    // mode-of-bigrams needs a per-(doc, gram) count; hash the gram so the
    // shuffle carries (doc_id, long) — counts are identical unless two of
    // one doc's bigrams collide at 64 bits (negligible, and detectable:
    // the driver oracle counts the strings)
    val top = base.select(col("doc_id"), explode(col("g2")).as("bg"))
      .groupBy(col("doc_id"), xxhash64(col("bg")).as("bgh"))
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("maxc"), sum("c").as("totc"))
    inRow.join(top, Seq("doc_id"), "left")
      .withColumn("top_bigram_frac",
        coalesce(round(col("maxc").cast("double") / col("totc"), 6),
          lit(0.0)))
      .select(col("doc_id"), col("dup_bigram_frac"),
        col("dup_trigram_frac"), col("top_bigram_frac"),
        (col("dup_bigram_frac") <= maxDupBigramFrac &&
          col("top_bigram_frac") <= maxTopBigramFrac).as("keep"))
  }

  /** Corpus-level duplicated-span fraction per doc: the share of a doc's
    * distinct `n`-token spans that appear in at least one OTHER doc.
    * Docs shorter than `n` tokens emit no row (they have no spans).
    * Per-doc spans are distinct (kernel contract, same one
    * [[Decontam.overlapHashed]] relies on), so the per-hash group count
    * IS the number of docs containing the span — no distinct aggregate
    * needed. */
  def dupSpanFraction(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val spans = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.GraftFunctions.ngramHashes(
        lower(col(textCol)), n)).as("h"))
    val docsPerSpan = spans.groupBy("h").agg(count(lit(1)).as("nd"))
    spans.join(docsPerSpan, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("nd") > 1, 1).otherwise(0)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6)
          .as("dup_span_frac"))
  }
}
