package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass every
  * training-corpus pipeline runs before release (emails, phone
  * numbers, IPv4 addresses, SSN-shaped ids, 16-digit card-shaped
  * numbers). Pattern-based: the classes regexes catch reliably; NER
  * tiers sit above this operator, not in it.
  *
  * All patterns are shared Java-regex/RE2 subset (no backrefs, no
  * lookarounds), so the DuckDB oracle replays them verbatim.
  * Detection counts and redaction are pure per-row projections —
  * map-only at any scale, no shuffle, codegen'd `regexp_*` built-ins.
  * Order of redaction is fixed (most-specific first: card before
  * phone before SSN) so overlapping matches resolve identically
  * everywhere.
  */
object Pii {

  /** (class → regex), applied in declaration order. Card/SSN/phone
    * are digit-shaped and partially overlapping — the fixed order
    * keeps redaction deterministic. */
  val patterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "card" -> "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b",
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "phone" -> "\\b\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}\\b",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b")

  /** Per-document PII counts: (idCol, n_email, n_card, n_ssn,
    * n_phone, n_ipv4, n_pii). Counts overlap-free per class but a
    * string can count in several classes (a card number is also four
    * phone-shaped chunks — counts answer "what would the redactor of
    * THIS class touch"). Map-only. */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = patterns.map { case (name, re) =>
      regexp_count(col(textCol), lit(re)).cast("long").as(s"n_$name")
    }
    docs.select(col(idCol) +: counts: _*)
      .withColumn("n_pii",
        patterns.map(p => col(s"n_${p._1}")).reduce(_ + _))
  }

  /** Redacted text: each class replaced by its `[CLASS]` token, in
    * [[patterns]] order. Returns (idCol, text_redacted, n_pii).
    * Map-only; the redacted text never shuffles unless the caller
    * shuffles it. */
  def redact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = patterns.foldLeft(col(textCol)) {
      case (c, (name, re)) =>
        regexp_replace(c, lit(re), lit(s"[${name.toUpperCase}]"))
    }
    val nPii: Column = patterns
      .map(p => regexp_count(col(textCol), lit(p._2)).cast("long"))
      .reduce(_ + _)
    docs.select(col(idCol), redacted.as("text_redacted"),
      nPii.as("n_pii"))
  }

  /** Card-shaped matches validated by the Luhn checksum — the filter
    * that separates real card numbers from digit noise the shape regex
    * alone cannot (phone-ish runs, invoice ids): per document, the
    * count of card-SHAPED matches and how many of them PASS Luhn.
    * Redaction policy then keys off n_luhn_valid, not shape counts.
    *
    * Map-only; the checksum is in-row integer arithmetic over the 16
    * digits (double every second digit from the right, subtract 9 past
    * 9, sum % 10) — exact and SQL-replayable cross-engine. */
  def luhnValidCards(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val cardRe = patterns.toMap.apply("card")
    val matches = regexp_extract_all(col(textCol), lit(cardRe), lit(0))
    def luhnOk(ds: Column): Column = {
      val arr = split(ds, "")
      val n = size(arr)
      val conts = transform(arr, (c, idx) => {
        val d = c.cast("int")
        when((n - idx) % 2 === 0,
          when(d >= 5, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      })
      aggregate(conts, lit(0), (a, x) => a + x) % 10 === 0
    }
    docs.select(col(idCol),
      size(matches).cast("long").as("n_card_shaped"),
      size(filter(matches,
        m => luhnOk(regexp_replace(m, "[^0-9]", ""))))
        .cast("long").as("n_luhn_valid"))
  }
}
