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
