package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic test on a corpus with PLANTED near-duplicates: take real
  * documents, add perturbed copies (one token changed / appended), and
  * require the near-dup detectors to find the planted pairs and the
  * dedup operator to remove exactly the copies. */
class PlantedDupSpec extends SparkSpec {

  private def planted() = {
    import spark.implicits._
    val base = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(50)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val copies = base.map { case (id, text) =>
      (id + 100000L, text + " perturbedtoken") // near-dup of id
    }
    val far = base.map { case (id, _) =>
      // pairwise-distinct token sets (id-derived), so far docs are not
      // near-dups of each other either
      (id + 200000L, (0 to 9).map(j => s"zz${id}t$j").mkString(" "))
    }
    (base ++ copies ++ far).toSeq.toDF("doc_id", "text")
  }

  test("minhash LSH finds every planted near-dup pair") {
    val docs = planted()
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val baseIds = docs.filter(col("doc_id") < 100000L)
      .select("doc_id").collect().map(_.getLong(0))
    baseIds.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"planted pair ($id, ${id + 100000L}) missed")
    }
  }

  test("minhashDedup removes the planted copies, keeps originals") {
    val docs = planted()
    val survivors = Dedup.minhashDedup(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val baseIds = docs.filter(col("doc_id") < 100000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    baseIds.foreach { id =>
      assert(!survivors.contains(id + 100000L),
        s"planted copy of $id must be removed")
      assert(survivors.contains(id + 200000L),
        s"unrelated doc ${id + 200000L} must survive")
    }
    // the synthetic corpus contains a few TRUE near-dup pairs among the
    // originals (shared tiny vocabulary); those clusters legitimately
    // collapse to their min id — allow a handful, not a collapse
    val baseSurvivors = baseIds.count(survivors.contains)
    assert(baseSurvivors >= 45,
      s"only $baseSurvivors/50 originals survived — over-deduplication")
  }

  test("simhash hamming distance separates planted dups from unrelated") {
    import spark.implicits._
    val docs = planted()
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseIds = sigs.keys.filter(_ < 100000L)
    val dupDists = baseIds.map(id =>
      java.lang.Long.bitCount(sigs(id) ^ sigs(id + 100000L)))
    val farDists = baseIds.map(id =>
      java.lang.Long.bitCount(sigs(id) ^ sigs(id + 200000L)))
    assert(dupDists.sum.toDouble / dupDists.size <
      farDists.sum.toDouble / farDists.size - 5,
      "planted dups must be markedly closer in hamming space")
  }
}
