package graft.operators

import graft.SparkSpec

/** [[Eval.bleu]]: hand-computed clipped precisions + brevity penalty,
  * the unsmoothed zero rule, identity, and length edge cases. */
class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("hand-computed BLEU-4 on a classic pair") {
    val cand = "the cat sat on the mat"
    val ref = "the cat is on the mat"
    // unigrams: cand 6, clipped matches: the(2),cat,on,mat = 5
    // bigrams: cand 5 [the cat, cat sat, sat on, on the, the mat];
    //   ref [the cat, cat is, is on, on the, the mat] → 3
    // trigrams: cand 4, ref 4 → overlap [on the mat] = 1
    // 4-grams: cand 3, ref 3 → 0 → unsmoothed BLEU = 0
    val got = Eval.bleu(Seq((1L, cand, ref)).toDF("id", "c", "r"),
      "id", "c", "r", 4).collect().head
    assert(got.getLong(1) == 6 && got.getLong(2) == 6)
    assert(got.getDouble(3) == 5.0 / 6)
    assert(got.getDouble(4) == 3.0 / 5)
    assert(got.getDouble(5) == 1.0 / 4)
    assert(got.getDouble(6) == 0.0)
    assert(got.getDouble(7) == 1.0) // equal lengths → bp 1
    assert(got.getDouble(8) == 0.0) // p_4 = 0 → unsmoothed zero
  }

  test("BLEU-2 with a short candidate pays the brevity penalty") {
    val got = Eval.bleu(
      Seq((1L, "the cat", "the cat sat on the mat")).toDF("id", "c", "r"),
      "id", "c", "r", 2).collect().head
    // p1 = 2/2, p2 = 1/1; bp = exp(1 - 6/2)
    assert(got.getDouble(3) == 1.0 && got.getDouble(4) == 1.0)
    val bp = math.exp(1.0 - 6.0 / 2)
    assert(got.getDouble(5) == r6(bp))
    assert(got.getDouble(6) ==
      r6(bp * math.exp((math.log(1.0) + math.log(1.0)) / 2.0)))
  }

  test("identical texts: all precisions 1, bp 1, bleu 1") {
    val got = Eval.bleu(
      Seq((1L, "a b c d e", "a b c d e")).toDF("id", "c", "r"),
      "id", "c", "r", 4).collect().head
    (3 to 6).foreach(i => assert(got.getDouble(i) == 1.0))
    assert(got.getDouble(7) == 1.0 && got.getDouble(8) == 1.0)
  }

  test("empty candidate and short-for-n rows survive at zero") {
    val rows = Seq((1L, "", "some reference"), (2L, "ab cd", "ab cd"))
    val got = Eval.bleu(rows.toDF("id", "c", "r"), "id", "c", "r", 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 2)
    assert(got(1L).getLong(1) == 0 && got(1L).getDouble(8) == 0.0)
    // pair 2: identical but only 2 tokens → p_3 = p_4 = 0 → bleu 0,
    // while p_1 = p_2 = 1 stay visible
    assert(got(2L).getDouble(3) == 1.0 && got(2L).getDouble(4) == 1.0)
    assert(got(2L).getDouble(8) == 0.0)
  }
}
