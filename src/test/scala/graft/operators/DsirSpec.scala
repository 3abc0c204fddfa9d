package graft.operators

import graft.SparkSpec

/** DSIR importance weights against an independent Scala re-derivation
  * on a closed-form corpus, plus the ordering property selection
  * exists to deliver. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat"),          // target-like
    (2L, "the cat ran"),          // target-like
    (3L, "dogs bark loud"),       // off-target
    (4L, "the cat sat")           // duplicate of 1 — same weight
  ).toDF("doc_id", "text")
  private val target = corpus.filter($"doc_id" <= 2)

  private def bigrams(t: String): Seq[String] = {
    val toks = t.toLowerCase.split(" ").filter(_ => true).toSeq
    if (toks.size < 2) Nil
    else (0 to toks.size - 2).map(i => s"${toks(i)} ${toks(i + 1)}")
      .distinct
  }

  test("weights match the independent re-derivation at 6dp") {
    val docs = Map(1L -> "the cat sat", 2L -> "the cat ran",
      3L -> "dogs bark loud", 4L -> "the cat sat")
    val tgtIds = Set(1L, 2L)
    val srcCounts = docs.toSeq.flatMap { case (_, t) => bigrams(t) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val tgtCounts = docs.toSeq.filter(d => tgtIds(d._1))
      .flatMap { case (_, t) => bigrams(t) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val nT = tgtIds.size.toDouble
    val nS = docs.size.toDouble
    def expected(id: Long): Double = {
      val gs = bigrams(docs(id))
      val lrs = gs.map { g =>
        math.log((tgtCounts.getOrElse(g, 0) + 1d) / (nT + 2d)) -
          math.log((srcCounts(g) + 1d) / (nS + 2d))
      }
      BigDecimal(lrs.sum / lrs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Dsir.importanceWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    (1L to 4L).foreach { id =>
      assert(got(id)._1 === bigrams(docs(id)).size.toLong, s"doc $id grams")
      assert(math.abs(got(id)._2 - expected(id)) < 1e-9, s"doc $id weight")
    }
    // the property selection relies on: target-like beats off-target,
    // duplicates tie
    assert(got(1L)._2 === got(4L)._2)
    assert(got(1L)._2 > got(3L)._2)
  }

  test("select keeps the deterministic top slice") {
    // doc 2 wins ("cat ran" is target-exclusive: lr 0.405 vs the
    // shared "cat sat" at 0); docs 1/4 tie — id breaks it, so 1 joins
    val w = Dsir.importanceWeights(corpus, target, "doc_id", "text")
    val top = Dsir.select(w, "doc_id", 2).collect().map(_.getLong(0))
    assert(top.toSeq === Seq(2L, 1L), s"got ${top.mkString(",")}")
  }
}
