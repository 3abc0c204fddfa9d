package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical text quality scoring — the CCNet-style language-model
  * filter of corpus assembly: score each document by its mean token
  * surprisal under a unigram model of the corpus itself, then threshold
  * or bucket on the score (gibberish and boilerplate sit in the tails;
  * typical prose in the middle).
  *
  * Scale shape: one token-count aggregate (shuffle key = token, the
  * classic word-count), one single-row global-stats broadcast, and one
  * token→count join whose shuffle carries (doc id, token) pairs —
  * nothing else. At 100 TB the count table is itself large but
  * id+count-shaped; a production variant hashes tokens to 8-byte keys
  * (exactly the [[Decontam]] tier) — kept as strings here so the DuckDB
  * oracle reproduces the score bit-for-bit.
  */
object TextScore {

  /** Per-doc mean unigram surprisal `avg(-ln p(tok))` with add-alpha
    * smoothing `p = (c + α) / (T + α·V)` over corpus counts c, total
    * tokens T, vocabulary size V. Returns (idCol, n_tokens,
    * avg_surprisal): lower = more typical of the corpus. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "smoothing alpha must be positive")
    // same tokenizer as the vocabulary/encode contract (one definition)
    val toks = df.select(col(idCol),
        explode(Tokenize.tokenCol(textCol)).as("tok"))
      .filter(col("tok") =!= "")
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val global = counts.agg(sum("c").cast("double").as("total"),
      count(lit(1)).cast("double").as("v"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(global))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log((col("c") + alpha)
          / (col("total") + lit(alpha) * col("v")))), 6).as("avg_surprisal"))
  }
}
