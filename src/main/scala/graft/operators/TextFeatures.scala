package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashing-trick featurization — the fixed-dimension bridge from text to
  * the vector tier ([[AnnSearch]], [[Clustering]], [[RandomProjection]])
  * when no learned embedding exists: each token hashes to one of `dim`
  * buckets and the document's feature is the bucket-count vector
  * (classic hashing TF; feed it to cosine/k-means/JL directly, no
  * vocabulary artifact, no OOV problem).
  *
  * Counts stay integral (array<long>) — the feature is EXACT, so the
  * driver gate hash-matches the full vector with no float contract at
  * all. The bucket hash is the repo's cross-engine md5 recipe
  * ([[Splits.bucketOfKey]]), reproducible in any engine.
  *
  * Scale shape: one (doc, cell)-keyed count aggregate (partial map-side
  * combine) and one per-doc assembly aggregate; the shuffles carry
  * (id, cell, count) triples only — dim bounds the per-doc state
  * regardless of document length. Docs with zero tokens drop out.
  */
object TextFeatures {

  /** Returns (idCol, tf: array<long> of length `dim`). */
  def hashingTf(df: DataFrame, idCol: String, textCol: String,
      dim: Int, salt: String = "tf"): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val toks = df.select(col(idCol),
        explode(split(lower(col(textCol)), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val cells = toks
      .withColumn("cell", Splits.bucketOfKey(
        Splits.saltedKey(col("tok"), salt), dim))
      .groupBy(col(idCol), col("cell"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(idCol)
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("cell"), col("c"))))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("tf"))
  }
}
