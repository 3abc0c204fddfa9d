package graft.operators

import graft.SparkSpec

/** Closed-form PII detection/redaction: every class, overlap order,
  * clean text untouched. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "reach me at jo.doe+x@mail.example.org or 555-123-4567 thanks"),
    (2L, "server 192.168.0.1 logged card 4000-1111-2222-3333 and ssn 123-45-6789"),
    (3L, "perfectly clean text with numbers 12 and 3456"),
    (4L, "two mails a@b.co c@d.io one ip 10.0.0.7")
  ).toDF("doc_id", "text")

  test("detect counts every class; clean text counts zero") {
    val got = Pii.detect(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_email") === 1L)
    assert(got(1L).getAs[Long]("n_phone") === 1L)
    assert(got(1L).getAs[Long]("n_pii") === 2L)
    assert(got(2L).getAs[Long]("n_ipv4") === 1L)
    assert(got(2L).getAs[Long]("n_card") === 1L)
    assert(got(2L).getAs[Long]("n_ssn") === 1L)
    assert(got(3L).getAs[Long]("n_pii") === 0L)
    assert(got(4L).getAs[Long]("n_email") === 2L)
    assert(got(4L).getAs[Long]("n_ipv4") === 1L)
  }

  test("redact replaces with class tokens in fixed order") {
    val got = Pii.redact(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) ===
      "reach me at [EMAIL] or [PHONE] thanks")
    assert(got(2L) ===
      "server [IPV4] logged card [CARD] and ssn [SSN]")
    assert(got(3L) === "perfectly clean text with numbers 12 and 3456")
    assert(got(4L) === "two mails [EMAIL] [EMAIL] one ip [IPV4]")
  }

  test("luhnValidCards: checksum separates valid cards from shapes") {
    import spark.implicits._
    // 4111-1111-1111-1111 passes Luhn; 4000-1111-2222-3333 sums to 44
    val docs = Seq(
      (1L, "pay 4111-1111-1111-1111 then card 4000-1111-2222-3333"),
      (2L, "no cards, just a phone 555-123-4567"),
      (3L, "two valid: 4111-1111-1111-1111 5500-0000-0000-0004"))
      .toDF("doc_id", "text")
    val got = Pii.luhnValidCards(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (2L, 0L, 0L), (3L, 2L, 2L)), got)
  }
}
