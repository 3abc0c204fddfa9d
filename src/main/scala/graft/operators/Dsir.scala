package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (Xie et al., NeurIPS'23):
  * score every raw-corpus document by how target-like its n-gram
  * distribution is — `w(doc) = E_g∈doc [ log p_target(g) − log
  * p_raw(g) ]` under Laplace-smoothed gram document frequencies — then
  * keep the top-weighted slice. The standard "make 100 TB of crawl
  * look like the high-quality target" selection pass.
  *
  * This is the exact-vocabulary form: grams are the literal bigram
  * strings, so the DuckDB oracle reproduces every count. The paper's
  * fixed-dimension variant hashes each gram into 2^k buckets — here
  * that is a one-expression swap (`xxhash64(gram) pmod 2^k` replacing
  * the gram string as the count key), which caps the count-table width
  * at any corpus size; the join/agg shape below is identical.
  *
  * Scale shape: one explode of DISTINCT per-doc grams (set semantics —
  * repeated grams in one doc count once, the doc-frequency estimator),
  * two gram-keyed count tables (partial-agg shuffles of gram keys
  * only), one equi join back on gram, one per-doc average. Text never
  * shuffles; (doc, gram) pairs do. Weights involve ln → rounded 6dp
  * per the repo's transcendental taxonomy.
  */
object Dsir {

  /** @param corpus  raw pool (idCol, textCol) — every doc is scored
    * @param target  the distribution to match (textCol; ids unused)
    * @return (idCol, n_grams, weight) — higher = more target-like
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
      idCol: String, textCol: String, n: Int = 2): DataFrame = {
    val grams = Decontam.ngrams(col(textCol), n)
    val corpusGrams = corpus
      .select(col(idCol), explode(grams).as("gram"))
    // doc totals as 1-row broadcast aggregates — no driver actions
    val totals = target.agg(count(lit(1)).as("__nt"))
      .crossJoin(corpus.agg(count(lit(1)).as("__ns")))
    val tgtCounts = target.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c_t"))
    val srcCounts = corpusGrams.groupBy("gram")
      .agg(count(lit(1)).as("c_s"))
    // Laplace-smoothed doc-frequency log ratio; +2 denominators keep
    // probabilities in (0,1) at both extremes. Unseen-in-target grams
    // get the c_t = 0 floor via the left join.
    corpusGrams
      .join(srcCounts, Seq("gram"))
      .join(tgtCounts, Seq("gram"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        (log((coalesce(col("c_t"), lit(0L)) + 1d) /
            (col("__nt") + 2d)) -
          log((col("c_s") + 1d) / (col("__ns") + 2d))).as("__lr"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        round(avg(col("__lr")), 6).as("weight"))
  }

  /** Top-fraction selection on [[importanceWeights]]: deterministic
    * (weight desc, id) cut — the resampling step with temperature 0.
    * `k` is a row count, not a fraction, so callers at different SFs
    * pass their own budget. */
  def select(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("weight").desc, col(idCol)).limit(k)
}
