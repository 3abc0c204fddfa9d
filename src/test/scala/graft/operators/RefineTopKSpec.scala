package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AnnSearch.refineTopK — the exact re-rank tail of the ADC+R recipe
  * (round 13). Hand-computed 2-D fixture: the refine stage must rank
  * ONLY the supplied candidate ids, by the requested exact metric,
  * with the (score, cand_id) tie rule shared with every other tier. */
class RefineTopKSpec extends SparkSpec {
  import spark.implicits._

  // probe 0 = (1,0); candidates at known angles/distances
  private lazy val corpus = Seq(
    (0L, Seq(1.0f, 0.0f)),   // the probe itself (excluded by pairs)
    (1L, Seq(1.0f, 0.0f)),   // cos 1.0, l2 0.0
    (2L, Seq(0.0f, 1.0f)),   // cos 0.0, l2 sqrt(2)
    (3L, Seq(-1.0f, 0.0f)),  // cos -1.0, l2 2.0
    (4L, Seq(1.0f, 1.0f)),   // cos 1/sqrt(2), l2 1.0
    (5L, Seq(2.0f, 0.0f))    // cos 1.0, l2 1.0 — cosine ties with 1
  ).toDF("vec_id", "embedding")
  private lazy val probes = corpus.filter(col("vec_id") === 0)

  private def pairsOf(ids: Long*) =
    ids.map(c => (0L, c)).toDF("probe_id", "cand_id")

  test("cosine refine ranks candidates by exact cosine, ties to " +
      "smaller cand_id") {
    val got = AnnSearch.refineTopK(pairsOf(2L, 3L, 4L, 5L, 1L),
        corpus, probes, k = 3)
      .orderBy("rank")
      .select("cand_id", "cos", "rank")
      .as[(Long, Double, Int)].collect().toSeq
    // cos: 1 -> 1.0, 5 -> 1.0 (tie: id 1 first), 4 -> 0.707107
    assert(got.map(_._1) == Seq(1L, 5L, 4L), got.toString)
    assert(got(0)._2 == 1.0 && got(1)._2 == 1.0)
    assert(math.abs(got(2)._2 - 0.707107) < 1e-9, got.toString)
  }

  test("l2 refine ranks ascending by exact distance") {
    val got = AnnSearch.refineTopK(pairsOf(2L, 3L, 4L, 5L),
        corpus, probes, k = 3, metric = "l2")
      .orderBy("rank")
      .select("cand_id", "l2", "rank")
      .as[(Long, Double, Int)].collect().toSeq
    // l2: 4 -> 1.0, 5 -> 1.0 (tie: id 4 first), 2 -> sqrt(2)
    assert(got.map(_._1) == Seq(4L, 5L, 2L), got.toString)
    assert(got(0)._2 == 1.0 && got(1)._2 == 1.0)
    assert(math.abs(got(2)._2 - 1.414214) < 1e-9, got.toString)
  }

  test("only supplied candidates are scored — the refine stage never " +
      "rescans the corpus") {
    val got = AnnSearch.refineTopK(pairsOf(3L), corpus, probes, k = 10)
      .select("cand_id").as[Long].collect().toSeq
    assert(got == Seq(3L), got.toString)
  }

  test("unknown metric raises") {
    val e = intercept[IllegalArgumentException] {
      AnnSearch.refineTopK(pairsOf(1L), corpus, probes, k = 1,
        metric = "dot")
    }
    assert(e.getMessage.contains("metric"), e.getMessage)
  }

  test("ADC shortlist -> refine recovers the exact L2 top-k the " +
      "quantized ordering misses (the ADC+R composition)") {
    // 8-dim corpus; PQ at m=8, k=2 is maximally lossy — ADC ordering
    // diverges from exact, refine must restore it for the shortlist
    val n = 40
    val dim = 8
    val c = (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j =>
        (math.sin(i * 37 + j * 17) * 10).toFloat))
    }.toDF("vec_id", "embedding")
    val p = c.filter(col("vec_id") === 0)
    val books = Pq.trainCodebooks(c, "vec_id", "embedding",
      m = 8, k = 2, dim = dim)
    val codes = Pq.encode(c, "embedding", books, m = 8, k = 2)
      .select("vec_id", "pq_codes")
    val shortlist = Pq.adcTopK(codes, books, p, k = n, m = 8, kCodes = 2)
    val refined = AnnSearch.refineTopK(shortlist, c, p, k = 5,
        metric = "l2")
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    // exact ground truth over the same corpus
    val exact = AnnSearch.refineTopK(
        (1 until n).map(i => (0L, i.toLong))
          .toDF("probe_id", "cand_id"), c, p, k = 5, metric = "l2")
      .orderBy("rank").select("cand_id").as[Long].collect().toSeq
    assert(refined == exact, s"$refined vs $exact")
  }
}
