package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear classifier INFERENCE over hashed text features — the quality-
  * classifier pass of corpus curation (C4's langid filter, GPT-3/Gopher's
  * quality logistic regressions) as a first-class pipeline op: score =
  * σ(w·tf / scale), keep = score ≥ threshold. Training happens offline
  * (any solver, tiny data); what a 100 TB pipeline needs from the ENGINE
  * is fast, reproducible inference — which is a broadcast of the weight
  * vector and one map-only pass over the corpus: no shuffle, no UDF, the
  * whole scorer is codegen'd `zip_with`/`aggregate` over the
  * [[TextFeatures.hashingTf]] fixed-dimension bridge.
  *
  * Determinism contract: weights are INTEGER (fixed-point, as shipped
  * quality classifiers usually are post-quantization) and tf counts are
  * integer, so the dot product is exact int64 arithmetic — order-
  * independent, engine-independent — and only the final σ touches
  * doubles (one division + one exp per row, rounded for the gate).
  */
object Classifier {

  /** Deterministic fixed-point demo weights (Knuth multiplicative hash,
    * ±500 fixed-point at scale 1000): reproducible in any engine from
    * the closed form `(i·2654435761) mod 1000 − 500`. */
  def hashWeights(dim: Int): Seq[Long] =
    (0 until dim).map(i => (i * 2654435761L) % 1000 - 500)

  /** Score every document: (idCol, n_tokens, logit, score, keep).
    * `weights` are fixed-point at `scale` (w_true = w / scale); the
    * logit is `(w·tf) / (scale · n_tokens)` — mean per-token evidence,
    * so long documents don't saturate σ by length alone. */
  def linearScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int, weights: Seq[Long], scale: Double = 1000.0,
      threshold: Double = 0.5): DataFrame = {
    require(weights.length == dim, s"need $dim weights, got ${weights.length}")
    val tf = TextFeatures.hashingTf(df, idCol, textCol, dim)
    val w = typedLit(weights)
    val dot = aggregate(zip_with(col("tf"), w, (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val n = aggregate(col("tf"), lit(0L), (acc, v) => acc + v)
    tf.select(col(idCol), n.as("n_tokens"), dot.as("__dot"))
      .filter(col("n_tokens") > 0)
      .withColumn("logit",
        col("__dot").cast("double") / (lit(scale) * col("n_tokens")))
      // the logit ships RAW: it is one IEEE division of exact integers,
      // bit-identical in any engine — while ROUNDING it would flake,
      // because dot/(scale·n) often terminates exactly on a decimal
      // rounding boundary (scale·n = 2^k·10^m denominators), where
      // Spark's shortest-decimal HALF_UP and an engine rounding the
      // true binary value disagree. σ is transcendental, so its rounded
      // form has no boundary population and gates safely.
      .select(col(idCol), col("n_tokens"), col("logit"),
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 6).as("score"),
        (lit(1.0) / (lit(1.0) + exp(-col("logit"))) >= threshold)
          .as("keep"))
  }
}
