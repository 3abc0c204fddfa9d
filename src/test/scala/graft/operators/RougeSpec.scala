package graft.operators

import graft.SparkSpec

/** [[Eval.rougeN]]: hand-computed clipped overlaps, the clipping
  * property itself, identity/disjoint extremes, empty sides, and
  * unigram vs bigram grain. */
class RougeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed ROUGE-2 with clipping") {
    // cand bigrams: [the cat, cat sat, sat down] ; ref bigrams:
    // [the cat, cat sat, sat on, on the, the mat] → overlap 2
    val rows = Seq((1L, "the cat sat down", "the cat sat on the mat"))
    val got = Eval.rougeN(rows.toDF("id", "cand", "ref"),
      "id", "cand", "ref", 2).collect().head
    assert(got.getLong(1) == 3 && got.getLong(2) == 5 &&
      got.getLong(3) == 2)
    assert(got.getDouble(4) == 2.0 / 3 && got.getDouble(5) == 2.0 / 5)
    val p = 2.0 / 3; val r = 2.0 / 5
    assert(got.getDouble(6) == 2.0 * p * r / (p + r))
  }

  test("counts are clipped, not boolean: repeats credit min multiplicity") {
    // cand: "a a a a" → bigram "a a" ×3; ref: "a a a" → "a a" ×2;
    // clipped overlap = 2 (NOT 3, NOT 1)
    val rows = Seq((1L, "a a a a", "a a a"))
    val got = Eval.rougeN(rows.toDF("id", "cand", "ref"),
      "id", "cand", "ref", 2).collect().head
    assert(got.getLong(1) == 3 && got.getLong(2) == 2 &&
      got.getLong(3) == 2)
  }

  test("identical texts score 1.0; disjoint texts 0.0") {
    val rows = Seq(
      (1L, "alpha beta gamma", "alpha beta gamma"),
      (2L, "alpha beta gamma", "delta epsilon zeta"))
    val got = Eval.rougeN(rows.toDF("id", "cand", "ref"),
        "id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    assert(got(1L) == 1.0 && got(2L) == 0.0)
  }

  test("short/empty sides keep their row with zero scores") {
    val rows = Seq(
      (1L, "one", "two words here"), // cand has no bigram
      (2L, "", ""),                  // both empty
      (3L, "x y", "x y"))
    val got = Eval.rougeN(rows.toDF("id", "cand", "ref"),
        "id", "cand", "ref", 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 3)
    assert(got(1L).getLong(1) == 0 && got(1L).getLong(2) == 2 &&
      got(1L).getDouble(6) == 0.0)
    assert(got(2L).getLong(2) == 0 && got(2L).getDouble(6) == 0.0)
    assert(got(3L).getDouble(6) == 1.0)
  }

  test("duplicate pair ids raise loudly (scores would pool)") {
    val rows = Seq((1L, "a b", "a b"), (1L, "a b", "c d"))
    val e = intercept[Exception] {
      Eval.rougeN(rows.toDF("id", "cand", "ref"),
        "id", "cand", "ref", 2).collect()
    }
    assert(e.getMessage.contains("duplicate pair id"))
    val e2 = intercept[Exception] {
      Eval.bleu(rows.toDF("id", "cand", "ref"),
        "id", "cand", "ref", 2).collect()
    }
    assert(e2.getMessage.contains("duplicate pair id"))
  }

  test("unigram grain (ROUGE-1) counts tokens, order-free") {
    val rows = Seq((1L, "b a", "a b c"))
    val got = Eval.rougeN(rows.toDF("id", "cand", "ref"),
      "id", "cand", "ref", 1).collect().head
    assert(got.getLong(1) == 2 && got.getLong(2) == 3 &&
      got.getLong(3) == 2)
    assert(got.getDouble(4) == 1.0 && got.getDouble(5) == 2.0 / 3)
  }
}
