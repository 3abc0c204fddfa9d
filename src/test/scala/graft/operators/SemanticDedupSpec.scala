package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-duplicate oracle for embedding-space (semantic) dedup:
  * exact vector copies share every hyperplane sign bit, so they MUST
  * collide in every bucket, be found as pairs, and be removed
  * greedily. The k-means variant is exercised too. */
class SemanticDedupSpec extends SparkSpec {

  private def planted() = {
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    emb.unionAll(emb.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding")))
  }

  test("every planted exact copy pairs with its original") {
    val docs = planted()
    val baseIds = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val pairs = Dedup.semanticNearDup(docs, "vec_id", "embedding",
        threshold = 0.999)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    baseIds.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"planted copy pair ($id, ${id + 100000L}) missed")
    }
  }

  test("greedy semantic dedup removes the copies, keeps originals") {
    val docs = planted()
    val survivors = Dedup.semanticDedup(docs, "vec_id", "embedding",
        threshold = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val baseIds = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(survivors == baseIds,
      s"expected exactly the originals; diff +${survivors -- baseIds} " +
        s"-${baseIds -- survivors}")
  }

  test("k-means variant also finds every planted copy pair") {
    val docs = planted()
    val baseIds = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val pairs = Dedup.semanticNearDupKmeans(docs, "vec_id", "embedding",
        threshold = 0.999)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    baseIds.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"planted copy pair ($id, ${id + 100000L}) missed")
    }
  }

  test("candidate generation shuffles ids only (vectors ride the verify)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val vecShuffles = Dedup.semanticNearDup(planted(), "vec_id",
          "embedding", threshold = 0.9)
        .queryExecution.executedPlan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
              if e.output.exists(a => a.name.contains("vec") ||
                a.name == "embedding" || a.name == "centvec") =>
            e.output.map(_.name)
        }
      // the only vector-carrying exchanges allowed are the two id-keyed
      // gather joins for the verify step
      assert(vecShuffles.size <= 2,
        s"vectors ride ${vecShuffles.size} shuffles: $vecShuffles")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
