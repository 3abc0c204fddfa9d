package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnSearch, Dedup, Multimodal}
import graft.sources.Tables

/** Driver-facing queries for the near-dup / ANN / multimodal operator
  * suite (SURVEY §2B E35, E38, E40).
  *
  * MinHash/SimHash/LSH internals hash with xxhash64, which DuckDB cannot
  * reproduce — those register rows-only here and carry ScalaTest oracles
  * (brute-force Jaccard / recall-vs-exact) instead. The embedding near-dup
  * and the stub multimodal decode are exactly reproducible in SQL and get
  * full hash-matched oracles.
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** MinHash-LSH near-dup candidates (E35) — rows-only; recall/precision
    * asserted in DedupSpec against brute-force token Jaccard. */
  val minhashNearDup: Q = (s, d) =>
    Dedup.minhashLsh(Tables.documents(s, d), "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.3)

  /** SimHash near-dup pairs (E35) — rows-only. */
  val simhashNearDup: Q = (s, d) =>
    Dedup.simhashNearDup(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  /** Embedding-cosine near-dup pairs (E35/E36) — exact, oracle-matched. */
  val embedNearDup: Q = (s, d) =>
    Dedup.embeddingNearDup(Tables.embeddings(s, d), "vec_id", "embedding",
      probeMax = 100L, threshold = 0.35)

  /** Hyperplane-LSH ANN top-k (E38) — rows-only; recall vs brute force
    * asserted in AnnSearchSpec. */
  val annLsh: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    AnnSearch.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
      tables = 8, bits = 6)
  }

  /** IVF ANN top-k (E38) — rows-only; recall asserted in AnnSearchSpec. */
  val annIvf: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    AnnSearch.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
      centroidStride = 25, nprobe = 4)
  }

  /** Multimodal stub decode (E40): binary payload → typed metadata +
    * feature lane, via per-partition decoder. Deterministic stub ⇒ full
    * SQL oracle. */
  val multimodalDecode: Q = (s, d) => Multimodal.decodedMeta(s, d)
}
