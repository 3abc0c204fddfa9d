package graft.operators

import graft.SparkSpec

/** [[Eval.confusionStats]] on a hand-built multiclass fixture covering
  * the hallucinated-class and never-predicted-class rows plus the
  * sklearn zero-division convention. */
class ConfusionStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed per-class stats, union of actual and predicted") {
    // actual en×6 (4 hit, 1→de, 1→ghost), de×3 (2 hit, 1→en),
    // fr×2 (0 hit, both →en): 'ghost' is predicted-only, 'fr' gets
    // recall 0 with precision 0 (never predicted correctly or at all)
    val rows = Seq(
      ("en", "en"), ("en", "en"), ("en", "en"), ("en", "en"),
      ("en", "de"), ("en", "ghost"),
      ("de", "de"), ("de", "de"), ("de", "en"),
      ("fr", "en"), ("fr", "en"))
    val got = Eval.confusionStats(rows.toDF("actual", "pred"),
        "actual", "pred")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("en", "de", "fr", "ghost"))
    val en = got("en")
    assert(en.getLong(1) == 4 && en.getLong(2) == 3 && en.getLong(3) == 2)
    assert(en.getDouble(4) == 4.0 / 7 && en.getDouble(5) == 4.0 / 6)
    assert(en.getDouble(6) ==
      2.0 * (4.0 / 7) * (4.0 / 6) / (4.0 / 7 + 4.0 / 6))
    val de = got("de")
    assert(de.getLong(1) == 2 && de.getLong(2) == 1 && de.getLong(3) == 1)
    assert(de.getDouble(4) == 2.0 / 3 && de.getDouble(5) == 2.0 / 3)
    // fr: never predicted → tp=0, fp=0, fn=2; precision 0 by the
    // zero-division convention, recall 0, f1 0
    val fr = got("fr")
    assert(fr.getLong(1) == 0 && fr.getLong(2) == 0 && fr.getLong(3) == 2)
    assert(fr.getDouble(4) == 0.0 && fr.getDouble(5) == 0.0 &&
      fr.getDouble(6) == 0.0)
    // ghost: predicted-only → tp=0, fp=1, fn=0; recall 0/0 → 0
    val gh = got("ghost")
    assert(gh.getLong(1) == 0 && gh.getLong(2) == 1 && gh.getLong(3) == 0)
    assert(gh.getDouble(4) == 0.0 && gh.getDouble(5) == 0.0 &&
      gh.getDouble(6) == 0.0)
  }

  test("perfect predictions: every class P = R = F1 = 1") {
    val rows = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("c", "c"))
    val got = Eval.confusionStats(rows.toDF("actual", "pred"),
      "actual", "pred").collect()
    assert(got.length == 3)
    got.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0)
      assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0 &&
        r.getDouble(6) == 1.0)
    }
  }

  test("null labels are excluded, not counted as a class") {
    val rows = Seq(
      (Some("a"), Some("a")), (None, Some("a")), (Some("b"), None))
    val got = Eval.confusionStats(
      rows.toDF("actual", "pred"), "actual", "pred").collect()
    assert(got.map(_.getString(0)).toSet == Set("a"))
    assert(got.head.getLong(1) == 1)
  }
}
