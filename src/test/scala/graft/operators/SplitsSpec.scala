package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Determinism/stability oracles for split assignment and the
  * content-leakage audit. */
class SplitsSpec extends SparkSpec {

  import spark.implicits._

  private val fractions =
    Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05)

  private def docs(n: Int, text: Long => String) =
    (0L until n.toLong).map(i => (i, text(i))).toDF("doc_id", "text")

  test("assignment is deterministic and stable under corpus growth") {
    def layout(n: Int) = Splits.assign(docs(n, _.toString), "doc_id",
        fractions)
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = layout(200); val big = layout(600)
    small.foreach { case (id, s) =>
      assert(big(id) == s, s"doc $id migrated when the corpus grew")
    }
    val shares = big.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(shares("train") > 480 && shares("train") < 590,
      s"train share off: $shares")
    assert(shares.keySet == Set("train", "valid", "test"))
  }

  test("fraction contract is enforced loudly") {
    intercept[IllegalArgumentException] {
      Splits.assign(docs(5, _.toString), "doc_id",
        Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Splits.assign(docs(5, _.toString), "doc_id",
        Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("leakage audit: identical content straddling splits is counted") {
    // 100 ids, ONE text: the content group spans splits with near
    // certainty under a 90/5/5 id-hash split, and then EVERY doc in the
    // group counts as leaked
    val out = Splits.leakageAudit(docs(100, _ => "same text"), "doc_id",
        "text", fractions)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (total, leaked) =
      (out.values.map(_._1).sum, out.values.map(_._2).sum)
    assert(total == 100)
    assert(out.size > 1, "fixture must span at least two splits")
    assert(leaked == 100, s"every copy counts as leaked, got $leaked")
  }

  test("leakage audit: unique content leaks nothing") {
    val out = Splits.leakageAudit(docs(300, i => s"text $i"), "doc_id",
      "text", fractions)
    assert(out.agg(sum("n_leaked")).head().getLong(0) == 0)
  }

  test("dedup-before-split is the fix the audit verifies") {
    val dirty = docs(100, i => s"text ${i % 10}") // 10 copies each
    val leakedBefore = Splits.leakageAudit(dirty, "doc_id", "text",
      fractions).agg(sum("n_leaked")).head().getLong(0)
    assert(leakedBefore > 0, "fixture must leak before dedup")
    val deduped = dirty.groupBy("text").agg(min("doc_id").as("doc_id"))
    val leakedAfter = Splits.leakageAudit(deduped, "doc_id", "text",
      fractions).agg(sum("n_leaked")).head().getLong(0)
    assert(leakedAfter == 0, "exact dedup must zero the audit")
  }

  test("embargoed time split: exact µs boundaries, gap excluded from " +
      "both sides, zero embargo degenerates to a plain cutoff") {
    val rows = Seq(
      (1L, 999_999L),          // train (just under the embargo start)
      (2L, 1_000_000L),        // embargo start, inclusive
      (3L, 1_999_999L),        // still embargo
      (4L, 2_000_000L),        // test start, inclusive
      (5L, 3_000_000L))        // test
      .toDF("id", "us")
      .selectExpr("id", "timestamp_micros(us) AS ts")
    val got = Splits.timeSplit(rows, "ts", testStartUs = 2_000_000L,
        embargoUs = 1_000_000L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "train", 2L -> "embargo", 3L -> "embargo",
      4L -> "test", 5L -> "test"))
    val noEmbargo = Splits.timeSplit(rows, "ts", 2_000_000L, 0L)
      .filter(col("split") === "embargo").count()
    assert(noEmbargo === 0L)
  }
}
