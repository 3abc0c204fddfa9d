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

  /** Positional inverted-index postings: one row per (doc, position,
    * term), the search-engine artifact behind phrase/proximity queries.
    * With `termFilter` non-empty only those terms' postings are emitted —
    * the posexplode and the term filter run fused inside the scan stage
    * (no exchange in between), so at 100 TB the row stream that reaches
    * any downstream shuffle is |matching tokens|, not |tokens|.
    * Tokenization matches the repo recipe (lowercase, whitespace split,
    * empty tokens dropped BEFORE positions are assigned). */
  def postings(docs: DataFrame, idCol: String, textCol: String,
      termFilter: Seq[String] = Nil): DataFrame = {
    val toks = filter(split(lower(col(textCol)), " "),
      t => length(t) > 0)
    val base = docs.select(col(idCol).as("doc_id"), posexplode(toks))
      .toDF("doc_id", "pos", "term")
    if (termFilter.isEmpty) base
    else base.filter(col("term").isin(termFilter: _*))
  }

  /** Exact phrase search via positional posting intersection: a phrase
    * `w0 w1 … wn` occurs at anchor `p` iff term `wi` has a posting at
    * `p + i` for every i — so each term's postings shift to their anchor
    * and the phrase is an n-way equi join on (doc, anchor). Shuffles
    * carry (doc_id, anchor) longs only, and only for the phrase's own
    * terms (the postings pre-filter); repeated phrase terms are handled
    * naturally (each slot joins its own shifted stream).
    *
    * @return (doc_id, n_occurrences, first_pos) per matching document;
    *         first_pos is 0-based
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    // postings terms are lowercased at the scan — lowercase the filter
    // AND the per-slot predicate so an uppercase query term matches
    // case-insensitively instead of silently returning nothing
    val posts = postings(docs, idCol, textCol,
      phrase.map(_.toLowerCase).distinct)
    val anchors = phrase.zipWithIndex.map { case (w, i) =>
      posts.filter(col("term") === lit(w.toLowerCase))
        .select(col("doc_id"), (col("pos") - i).as("anchor"))
    }
    anchors.reduce((a, b) => a.join(b, Seq("doc_id", "anchor")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occurrences"),
        min("anchor").cast("long").as("first_pos"))
  }
}
