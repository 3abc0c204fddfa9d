package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the retrieval/embedding prep step
  * of corpus assembly: long documents become `width`-token chunks every
  * `stride` tokens (overlap = `width - stride`) so no boundary sentence
  * is lost to a hard cut; each chunk then embeds/indexes independently
  * ([[AnnSearch]], [[IvfPq]]) while carrying (doc id, chunk id, start
  * position) back to its source.
  *
  * Chunk starts are `k·stride` for every `k ≥ 0` with `k·stride <
  * n_tokens` — the final chunks may be shorter than `width` (ragged
  * tail), and a doc shorter than one window yields exactly one chunk.
  * Empty docs yield no rows.
  *
  * Scale shape: ONE map-only projection (tokenize, window arithmetic)
  * plus the explode — no shuffle, no state; chunking 100 TB costs one
  * read and the fan-out write. Chunk counts are bounded per doc
  * (⌈tokens/stride⌉), so explode skew mirrors document-length skew and
  * nothing collects.
  */
object Chunking {

  /** Sentence-boundary chunking — the no-straddle sibling of
    * [[slidingWindows]] (the contract of every RAG text splitter):
    * split on sentence-terminator runs (`[.!?]+` followed by a space),
    * then GREEDILY merge consecutive sentences into chunks whose token
    * total stays ≤ `maxTokens`. A sentence never straddles a chunk; a
    * single sentence longer than `maxTokens` becomes its own oversized
    * chunk (splitting mid-sentence is the caller's explicit opt-in via
    * [[slidingWindows]], never silent).
    *
    * Scale shape: map-only like [[slidingWindows]] — segmentation is a
    * capture-and-reemit regexp (RE2-safe: no lookahead, so a SQL oracle
    * reproduces boundaries exactly) and the greedy merge is a fold
    * INSIDE the row (one `aggregate` HOF over per-sentence token
    * counts). Nothing shuffles at any corpus size; the sequential
    * recurrence never leaves the document it belongs to.
    *
    * Returns (idCol, sent_id, chunk_id, n_tokens, sentence), one row
    * per sentence, 1-based ids; chunk text reassembles with
    * `array_join(collect_list(sentence), " ")` when needed. */
  def sentences(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    // a control char no real text contains; the SQL mirror is chr(1)
    val marker = "\u0001"
    val base = df
      .withColumn("__sents", filter(
        split(regexp_replace(col(textCol), "([.!?]+) ", "$1" + marker),
          marker),
        s => length(s) > 0))
      .filter(size(col("__sents")) > 0)
      .withColumn("__cnt", transform(col("__sents"),
        s => size(filter(split(s, " "), t => length(t) > 0))))
    // greedy fold: (acc tokens in open chunk, open chunk id, per-
    // sentence assignments). First sentence always joins chunk 1
    // (acc = 0 disables the overflow test), matching the SQL oracle's
    // base case.
    val zero = struct(lit(0).as("acc"), lit(1).as("cid"),
      array().cast("array<int>").as("out"))
    val folded = aggregate(col("__cnt"), zero, (st, n) => {
      val over = st.getField("acc") > 0 &&
        st.getField("acc") + n > lit(maxTokens)
      val cid = when(over, st.getField("cid") + 1)
        .otherwise(st.getField("cid"))
      struct(
        when(over, n).otherwise(st.getField("acc") + n).as("acc"),
        cid.as("cid"),
        concat(st.getField("out"), array(cid)).as("out"))
    })
    base.withColumn("__cid", folded.getField("out"))
      .select(col(idCol), explode(transform(col("__sents"), (s, i) =>
        struct((i + 1).as("sent_id"),
          element_at(col("__cid"), i + 1).as("chunk_id"),
          element_at(col("__cnt"), i + 1).as("n_tokens"),
          s.as("sentence")))).as("__x"))
      .select(col(idCol), col("__x.sent_id"), col("__x.chunk_id"),
        col("__x.n_tokens"), col("__x.sentence"))
  }

  /** Explode to (idCol, chunk_id, start_pos, n_chunk_tokens,
    * chunk_text). Tokenization is single-space (the corpus contract
    * [[LineDedup.segmentByTokens]] also uses); empty tokens are
    * dropped. */
  def slidingWindows(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width >= 1, s"chunk width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width]: stride=$stride width=$width")
    val base = df
      .withColumn("__tk", filter(split(lower(col(textCol)), " "),
        t => length(t) > 0))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
    base
      .select(col(idCol), col("__tk"), col("__n"),
        posexplode(sequence(lit(0),
          ceil(col("__n") / lit(stride.toDouble)).cast("int") - 1)))
      .select(col(idCol), col("pos").as("chunk_id"),
        (col("pos") * stride).as("start_pos"),
        least(lit(width), col("__n") - col("pos") * stride)
          .as("n_chunk_tokens"),
        array_join(slice(col("__tk"), col("pos") * stride + 1,
          lit(width)), " ").as("chunk_text"))
  }
}
