package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** In-Scala oracles for the hash-based near-dup operators (their xxhash64
  * signatures are not reproducible in SQL, so the driver gets rows-only;
  * the semantic contract is enforced here against brute force). */
class DedupSpec extends SparkSpec {

  private lazy val docs = graft.sources.Tables.documents(spark, sf)

  /** Brute-force token-shingle Jaccard over all pairs (oracle). */
  private lazy val trueJaccard: Map[(Long, Long), Double] = {
    val shingled = docs
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    (for {
      (a, sa) <- shingled
      (b, sb) <- shingled if a < b
      inter = (sa & sb).size
      if inter > 0
    } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  test("minhash estimate tracks true Jaccard on emitted pairs") {
    val got = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bands = 8, threshold = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(got.nonEmpty, "expected some near-dup candidates at sf0.001")
    got.foreach { case ((a, b), est) =>
      val truth = trueJaccard.getOrElse((a, b), 0.0)
      // 32 hashes => sd ~ sqrt(p(1-p)/32) <= 0.09; allow 4 sd
      assert(math.abs(est - truth) <= 0.36,
        s"pair ($a,$b): est $est vs true $truth")
    }
  }

  test("minhash-LSH recall: finds high-Jaccard pairs") {
    val strong = trueJaccard.filter(_._2 >= 0.6).keySet
    if (strong.nonEmpty) {
      val got = Dedup.minhashLsh(docs, "doc_id", "text",
          numHashes = 32, bands = 16, threshold = 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = strong.count(got).toDouble / strong.size
      assert(recall >= 0.9,
        s"recall $recall over ${strong.size} strong pairs")
    }
  }

  test("simhash near-dup is exactly the hamming<=3 pair set (pigeonhole)") {
    val subset = docs.filter(col("doc_id") < 100)
    val sigs = subset
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashNearDup(subset, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected) // pigeonhole makes LSH complete here, not approx
  }

  test("exact dedup groups identical content only") {
    import spark.implicits._
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("id", "text")
    val out = Dedup.exactByContent(df, "id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 2L), (3L, 1L)))
  }
}
