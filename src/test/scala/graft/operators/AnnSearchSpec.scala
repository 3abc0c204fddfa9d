package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall oracles for the approximate search tiers (E37/E38): ground
  * truth is the exact brute-force top-k. */
class AnnSearchSpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
  private lazy val probes = emb.filter(col("vec_id") < 10)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val exact = topkSet(AnnSearch.bruteForceTopK(emb, probes, 10))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (p, truth) =>
      val got = approx.getOrElse(p, Set.empty)
      (truth & got).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("brute force matches independent driver-side computation") {
    val vecs = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val p0 = 3L
    val expect = vecs.filter(_._1 != p0)
      .map { case (id, v) => id -> cos(vecs(p0), v) }
      .toSeq.sortBy { case (id, c) => (-BigDecimal(c).setScale(6,
        BigDecimal.RoundingMode.HALF_UP), id) }
      .take(10).map(_._1).toSet
    assert(exact(p0) === expect)
  }

  test("hyperplane LSH recall beats random-candidate baseline") {
    val approx = topkSet(AnnSearch.lshTopK(emb, probes, 10,
      tables = 8, bits = 6))
    val r = recallOf(approx)
    // random candidate sets of the same size would land ~candidates/N;
    // hyperplane buckets correlate with cosine, so demand much more
    assert(r >= 0.3, s"LSH recall $r")
  }

  test("IVF recall with nprobe=4 of ~20 lists") {
    val approx = topkSet(AnnSearch.ivfTopK(emb, probes, 10,
      lists = 20, nprobe = 4))
    val r = recallOf(approx)
    assert(r >= 0.15, s"IVF recall $r")
  }

  test("ANN shuffle hygiene: embedding columns ride at most one exchange") {
    // candidate generation, dedup, and the top-k window must shuffle ids
    // only; the single allowed vector-carrying exchange is the gather
    // join that re-attaches cvec by cand_id (absent entirely when AQE
    // broadcasts the corpus side). AQE off so the static plan is final.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((name, df) <- Seq(
          "lsh" -> AnnSearch.lshTopK(emb, probes, 10, tables = 8, bits = 6),
          "ivf" -> AnnSearch.ivfTopK(emb, probes, 10,
            lists = 20, nprobe = 4))) {
        val vecShuffles = df.queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if e.output.exists(a => a.name == "cvec" || a.name == "pvec"
                || a.name == "embedding" || a.name == "__vec") =>
            e.output.map(_.name)
        }
        assert(vecShuffles.size <= 1,
          s"$name: embeddings ride ${vecShuffles.size} shuffles: $vecShuffles")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("broadcast-probe guard trips past spark.graft.ann.maxBroadcastProbes") {
    spark.conf.set("spark.graft.ann.maxBroadcastProbes", "3")
    try {
      for ((name, run) <- Seq[(String, () => Any)](
          "bruteForceTopK" -> (() => AnnSearch.bruteForceTopK(emb, probes, 5)),
          "lshTopK" -> (() => AnnSearch.lshTopK(emb, probes, 5)),
          "Pq.adcTopK" -> (() => {
            val books = Pq.trainCodebooks(emb, "vec_id", "embedding")
            Pq.adcTopK(Pq.encode(emb, "embedding", books)
              .select("vec_id", "pq_codes"), books, probes, 5)
          }))) {
        val e = intercept[IllegalArgumentException](run())
        assert(e.getMessage.contains("maxBroadcastProbes"), s"$name: $e")
        assert(e.getMessage.contains("Chunk the probes"),
          s"$name must name the partitioned-probe alternative")
      }
      // at or under the cap the same paths still plan
      AnnSearch.bruteForceTopK(emb, probes.limit(3), 5)
    } finally spark.conf.unset("spark.graft.ann.maxBroadcastProbes")
  }

  test("hard negatives exclude same-label rows and keep cosine order") {
    val got = AnnSearch.hardNegatives(emb, probes, 5)
    assert(got.filter(col("anchor_label") === col("cand_label"))
      .count() == 0, "a positive leaked into the negatives")
    assert(got.filter(col("anchor_id") === col("cand_id")).count() == 0)
    // per anchor: the negatives are exactly the cross-label prefix of the
    // full similarity ordering (mining must not skip a nearer negative)
    val full = AnnSearch.bruteForceTopK(emb, probes, Int.MaxValue - 1)
      .join(emb.select(col("vec_id").as("probe_id"),
        col("label").as("anchor_label")), "probe_id")
      .join(emb.select(col("vec_id").as("cand_id"),
        col("label").as("cand_label")), "cand_id")
      .filter(col("anchor_label") =!= col("cand_label"))
      .select(col("probe_id"), col("cand_id"), col("rank"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(2)).take(5).map(_.getLong(1)).toSeq)
      .toMap
    val mined = got.collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(5)).map(_.getLong(1)).toSeq).toMap
    assert(mined == full, "negatives must be the cross-label top-5")
  }

  test("more tables => recall does not degrade") {
    val r1 = recallOf(topkSet(AnnSearch.lshTopK(emb, probes, 10,
      tables = 2, bits = 6)))
    val r2 = recallOf(topkSet(AnnSearch.lshTopK(emb, probes, 10,
      tables = 12, bits = 6)))
    assert(r2 >= r1 - 0.05, s"recall regressed: $r1 -> $r2")
  }
}
