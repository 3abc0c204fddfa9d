package graft.queries

import org.apache.spark.sql.functions._

import graft.{DedupQualityBench => B, SparkSpec}
import graft.operators.{Dedup, SetSimJoin}
import graft.queries.{DedupQueries => DQ}

/** In-suite quality gates for the realistic dedup + sketch paths —
  * the r13-verdict #1 ask, closing the last unmeasured no_oracle
  * family: the planted twins pin the mechanics, but pair-level
  * precision/recall of the REALISTIC parameterizations against the
  * exact tier previously went unasserted. Thresholds here are
  * MEASURED-minus-margin (round 14, `runMain graft.DedupQualityBench`,
  * PERF.md dedup-quality table): sf0.001 measurements are minhash
  * P/R 1.0/1.0, survivor Jaccard 1.0 ×3, simhash P/R 1.0/1.0,
  * semantic candidate recall 0.80/0.97 on the 0.85-0.95 / 0.95+
  * cosine bands, HLL max rel err 0.054, KMV max rel err 0.0.
  * Hashing is deterministic given (data, params) — margins absorb
  * driver testdata regeneration drift, not code regressions.
  *
  * Measurement helpers come from [[graft.DedupQualityBench]] itself,
  * and parameterizations from the shared [[DedupQueries]] constants,
  * so spec, artifact, and gates cannot drift apart. */
class DedupQualitySpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf).cache()

  private lazy val truthAll = SetSimJoin.joinByJaccard(
    DQ.shingledDocs(spark, sf), "doc_id", "shingles",
    DQ.MinhashNearDupThreshold).cache()

  test("q_minhash_neardup pair precision/recall vs exact trigram " +
      "Jaccard (measured 1.0/1.0)") {
    val got = B.pairSet(
      graft.SparkEntry.queries("q_minhash_neardup")(spark, sf), "a", "b")
    val truth = B.pairSet(truthAll, "id1", "id2")
    val (p, r) = B.prf(got, truth)
    assert(truth.nonEmpty, "fixture lost its planted near-dup pairs")
    assert(p >= 0.95, s"precision $p < 0.95 (measured 1.0)")
    assert(r >= 0.95, s"recall $r < 0.95 (measured 1.0)")
  }

  test("greedy / keep-best / transitive survivor sets match the same " +
      "rules over the exact pair graph (measured Jaccard 1.0)") {
    val allIds = B.idSet(docs, "doc_id")
    val truth05 = B.pairSet(truthAll.filter(
      col("jaccard") >= DQ.MinhashDedupThreshold), "id1", "id2")
    val lshGreedy = B.idSet(Dedup.minhashDedup(docs, "doc_id", "text",
      DQ.MinhashNumHashes, DQ.MinhashBands, DQ.MinhashDedupThreshold),
      "doc_id")
    val jg = B.setJaccard(lshGreedy, allIds -- truth05.map(_._2))
    assert(jg >= 0.99, s"greedy survivor Jaccard $jg < 0.99")

    val truth04 = B.pairSet(truthAll.filter(
      col("jaccard") >= DQ.MinhashSurvivorThreshold), "id1", "id2")
    val qual = docs.select(col("doc_id").cast("long"),
        col("n_chars").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lshBest = B.idSet(Dedup.minhashDedupKeepBest(docs, "doc_id",
      "text", "n_chars", DQ.MinhashNumHashes, DQ.MinhashBands,
      DQ.MinhashSurvivorThreshold), "doc_id")
    val exactBest = allIds -- truth04.map { case (a, b) =>
      if (qual(a) < qual(b) || (qual(a) == qual(b) && a > b)) a else b
    }
    val jb = B.setJaccard(lshBest, exactBest)
    assert(jb >= 0.99, s"keep-best survivor Jaccard $jb < 0.99")

    val lshTrans = B.idSet(Dedup.minhashDedupTransitive(docs, "doc_id",
      "text", DQ.MinhashNumHashes, DQ.MinhashBands,
      DQ.MinhashSurvivorThreshold), "doc_id")
    val exactTrans = B.idSet(SetSimJoin.dedupFromPairs(docs, "doc_id",
      truthAll.filter(col("jaccard") >= DQ.MinhashSurvivorThreshold)
        .select("id1", "id2"), componentPartitions = Some(2))
      .filter(!col("is_dup")), "doc_id")
    val jt = B.setJaccard(lshTrans, exactTrans)
    assert(jt >= 0.99, s"transitive survivor Jaccard $jt < 0.99")
  }

  test("q_simhash_neardup matches exact all-pairs Hamming (pigeonhole " +
      "completeness + bucket-cap loss; measured 1.0/1.0)") {
    val got = B.pairSet(
      graft.SparkEntry.queries("q_simhash_neardup")(spark, sf), "a", "b")
    val truth = B.pairSet(
      B.simhashTruth(docs, DQ.SimhashMaxHamming), "a", "b")
    val (p, r) = B.prf(got, truth)
    assert(truth.nonEmpty, "simhash truth unexpectedly empty")
    assert(p == 1.0, s"precision $p != 1.0 (verify filter is exact)")
    assert(r >= 0.99, s"recall $r < 0.99 (pigeonhole is complete; " +
      "a miss means the bucket cap dropped a real pair)")
  }

  test("semantic hyperplane-LSH candidate recall on the near-dup " +
      "cosine bands (measured 0.80 / 0.97 at 8x10)") {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 100)
    val dim = base.select(size(col("embedding"))).head().getInt(0)
    // deterministic noisy variants at two grades inside the gate regime
    val mut = Seq(0.25, 0.5).zipWithIndex.foldLeft(base) {
      case (acc, (sigma, i)) =>
        val noise = transform(sequence(lit(0), lit(dim - 1)), j =>
          (pmod(xxhash64(col("vec_id"), j, lit(i)), lit(20001)) -
            lit(10000)).cast("double") / lit(10000.0))
        val nrm = sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x * x))
        acc.unionAll(base.select(
          (col("vec_id") + lit((i + 1) * 100000L)).as("vec_id"),
          zip_with(col("embedding"), noise, (x, e) =>
            x + e * lit(sigma) * nrm / lit(math.sqrt(dim / 3.0)))
            .as("embedding")))
    }.cache()
    val truth = B.pairSet(B.semanticTruth(mut, 0.85), "a", "b")
    val got = B.pairSet(Dedup.semanticCandidates(mut, "vec_id",
      "embedding", tables = DQ.SemanticTables, bits = DQ.SemanticBits),
      "a", "b")
    val (_, r) = B.prf(got, truth)
    assert(truth.size >= 100, s"planted band too thin: ${truth.size}")
    assert(r >= 0.75, s"candidate recall $r < 0.75 on cos>=0.85 " +
      "(measured 0.85+ at tables=8, bits=10)")
    mut.unpersist()
  }

  test("sketch relative error vs exact COUNT(DISTINCT) (measured " +
      "HLL<=0.054, KMV=0.0 at sf0.001)") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val exactH = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hllErr = graft.SparkEntry.queries("q_agg_approx_distinct")(
        spark, sf)
      .collect().map(r => math.abs(r.getLong(1) -
        exactH(r.getString(0))).toDouble / exactH(r.getString(0))).max
    assert(hllErr <= 0.12, s"HLL max rel err $hllErr > 0.12")

    val li = graft.sources.Tables.lineitem(spark, sf)
    val exactK = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmvErr = graft.SparkEntry.queries("q_kmv_distinct")(spark, sf)
      .collect().map(r => math.abs(r.getLong(1) -
        exactK(r.getString(0))).toDouble / exactK(r.getString(0))).max
    assert(kmvErr <= 0.05, s"KMV max rel err $kmvErr > 0.05")
  }
}
