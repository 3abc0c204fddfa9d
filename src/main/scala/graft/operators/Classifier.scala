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

  /** Calibration report (reliability diagram): equal-width score bins
    * with per-bin count, positive rate, mean confidence, and the
    * |confidence − accuracy| gap — `ECE = Σ_b (n_b/N)·gap_b` over the
    * output rows. One partial-agg pass; nothing driver-side.
    *
    * Exactness contract: `scoreCol` must be the 6dp-ROUNDED score (as
    * [[linearScore]] ships) — the DECIMAL(10,6) cast then recovers the
    * exact rational k/10⁶, so the per-bin confidence sum is
    * order-independent and `conf`/`acc`/`gap` are each ONE IEEE
    * division/subtraction of exact quantities (ship raw, the NOTES
    * taxonomy). Binning multiplies the same doubles in both engines,
    * so the floor is deterministic even when a rounded score sits at a
    * bin edge's binary neighborhood.
    *
    * @return (bin, n, n_pos, conf, acc, gap), bin ∈ [0, bins) */
  def calibration(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    scored.select(
        when(col(scoreCol) < 0.0 || col(scoreCol) > 1.0,
          raise_error(concat(lit("calibration: score out of [0,1]: "),
            col(scoreCol).cast("string"))))
          .otherwise(least(floor(col(scoreCol) * bins), lit(bins - 1)))
          .cast("int").as("bin"),
        col(scoreCol).cast("decimal(10,6)").as("__s"),
        col(labelCol).cast("boolean").as("__l"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("__s")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__ssum").cast("double") / col("n")).as("conf"),
        (col("n_pos").cast("double") / col("n")).as("acc"),
        abs(col("__ssum").cast("double") / col("n") -
          col("n_pos").cast("double") / col("n")).as("gap"))
  }
}
