package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Oracles for the PQ tier: quantization must (a) actually compress,
  * (b) reconstruct with less error than the trivial all-zeros baseline,
  * (c) rank true L2 neighbors well ahead of random. */
class PqSpec extends SparkSpec {

  private lazy val emb = graft.sources.Tables.embeddings(spark, sf)
  private lazy val books = Pq.trainCodebooks(emb, "vec_id", "embedding")
  private lazy val codes = Pq.encode(emb, "embedding", books)
    .select("vec_id", "pq_codes")

  test("codebooks: m×k entries, codes in range, m codes per vector") {
    val b = books.collect()
    assert(b.length === 8 * 16)
    val c = codes.collect()
    assert(c.forall(_.getSeq[Int](1).length === 8))
    assert(c.forall(_.getSeq[Int](1).forall(x => x >= 0 && x < 16)))
  }

  test("reconstruction error well below signal energy") {
    val err = Pq.decode(codes.join(emb, "vec_id"), books)
      .select(
        aggregate(zip_with(col("embedding"), col("pq_decoded"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (a, v) => a + v).as("se"),
        aggregate(col("embedding"), lit(0.0),
          (a, v) => a + v.cast("double") * v.cast("double")).as("energy"))
      .agg(sum("se").as("se"), sum("energy").as("energy"))
      .head()
    val ratio = err.getDouble(0) / err.getDouble(1)
    // the synthetic embeddings are near-iid gaussian — the hardest case
    // for a quantizer (no cluster structure to exploit); 16 centroids in
    // an 8-dim gaussian subspace caps capture well short of real-world
    // embedding manifolds. The gate: clearly below the all-zeros
    // baseline (ratio 1.0), i.e. the codebooks learned real structure.
    assert(ratio < 0.75, s"relative reconstruction error $ratio")
  }

  test("short corpus and mismatched ADC parameters fail loudly") {
    // fewer corpus rows than k: the codebook cannot seed m*k entries
    intercept[IllegalArgumentException](
      Pq.trainCodebooks(emb.filter(col("vec_id") < 4), "vec_id", "embedding"))
    // ADC with the wrong k must throw, not read garbage out of bounds
    val ex = intercept[org.apache.spark.SparkException](
      Pq.adcTopK(codes, books, emb.filter(col("vec_id") < 2), k = 5,
        kCodes = 8).collect())
    // whichever kernel sees the inconsistency first (dist-table build or
    // ADC scoring) must name itself in the error
    def mentionsKernel(m: String) =
      m != null && (m.contains("pq_adc") || m.contains("pq_dist_table"))
    assert(mentionsKernel(ex.getMessage) ||
      Option(ex.getCause).exists(c => mentionsKernel(c.getMessage)),
      ex.getMessage)
  }

  test("ADC recall@10 vs exact L2 beats random candidates") {
    val probes = emb.filter(col("vec_id") < 10)
    // exact L2 ground truth
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("l2").asc, col("cand_id"))
    val exact = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("cvec"))
      .join(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("pvec"))), col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        graft.functions.GraftFunctions.vecL2(col("pvec"), col("cvec")).as("l2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Pq.adcTopK(codes, books, probes, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (p, truth) =>
      (truth & approx.getOrElse(p, Set.empty)).size.toDouble / truth.size
    }.sum / exact.size
    // random 10-of-500 would land ~0.02; 4-bit-per-subspace PQ must do
    // far better while storing ~32x less than raw vectors
    assert(recall >= 0.3, s"ADC recall@10 = $recall")
  }
}
