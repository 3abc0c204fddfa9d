package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance scoring over a document corpus (training-data
  * pipeline: retrieve/rank documents for curriculum or eval construction).
  *
  * BM25 with the standard (k1, b) parameterization. Scale shape:
  *  - query terms are filtered INSIDE the token array (a codegen'd HOF)
  *    before the explode, so the explode emits only matching tokens — at
  *    100 TB the per-term row stream is |matches|, not |tokens|;
  *  - corpus statistics (N, avgdl) and per-term document frequencies are
  *    tiny aggregates, broadcast back into the scoring join — no driver
  *    collect, no second full scan of text;
  *  - every input to the score is integer-derived (counts, exact-in-double
  *    sums), so results are bit-reproducible across partitionings and
  *    engines — the DuckDB oracle hash-matches.
  */
object TextSearch {

  /** Top-`topN` docs by BM25 over `terms`. Returns (doc_id, bm25). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topN: Int = 20): DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val d = docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
        // keep only query-term tokens before exploding
        filter(col("toks"), t =>
          terms.map(w => t === lit(w)).reduce(_ || _)).as("qtoks"))
    val stats = d.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = d.select(col("doc_id"), col("dl"),
        explode(col("qtoks")).as("tok"))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("w", col("idf") * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id").agg(round(sum("w"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(topN)
  }
}
