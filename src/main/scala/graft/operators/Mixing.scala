package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic domain mixing: down-sample each group (source/domain)
  * to its target share of a document budget — the mixture-reweighting
  * step of training-corpus assembly ("60% web, 30% books, 10% code").
  *
  * Determinism: docs rank by a content-derived hash, so the mixture is
  * reproducible across runs and engines and stable under corpus
  * re-partitioning.
  *
  * Scale shape: phase 1 bounds every group with the custom
  * [[TopK.perGroup]] operator at k = max quota (per-task heaps, ≤ k
  * rows per group per task cross the shuffle); phase 2 applies each
  * group's exact quota with a row_number over the ≤ Σ quotas
  * survivors. The full corpus is never globally sorted, and a group
  * with billions of docs still ships only `max quota` rows per task.
  */
object Mixing {

  /** @param weights group value → target fraction of `budget`; groups
    *                absent from the map are dropped (weight 0)
    * @param budget  total docs wanted; each group contributes
    *                ⌊weight·budget⌋ docs (fewer if the group is smaller)
    */
  def sampleToWeights(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    require(weights.nonEmpty, "need at least one group weight")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0,1]: $weights")
    // exact decimal floor: budget*w in doubles truncates one doc short
    // whenever the product lands just under the integer (0.58*50 =
    // 28.999…96 → 28, not 29). BigDecimal of the weight's decimal text
    // keeps ⌊weight·budget⌋ exact for any budget.
    val quotas = weights.map { case (g, w) =>
      (g, (BigDecimal(w.toString) * BigDecimal(budget))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }
    val maxQ = quotas.values.max
    require(maxQ > 0, "all quotas are zero — raise budget or weights")
    require(maxQ <= Int.MaxValue, s"quota $maxQ exceeds Int range")
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = quotas.toSeq.toDF(groupCol, "__quota")
    val ranked = df.select(col(groupCol), col(idCol),
      md5(col(idCol).cast("string")).as("__rk"))
    val bounded = TopK.perGroup(ranked, Seq(groupCol), "__rk",
      k = maxQ.toInt, desc = false, tieBreak = Seq(idCol))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rk").asc, col(idCol).asc)
    bounded.join(broadcast(qdf), Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .select(col(groupCol), col(idCol))
  }

  /** Token-budget mixing: the production form of [[sampleToWeights]] —
    * real mixtures are specified in TOKENS, not documents ("web: 600 B
    * tokens"). Each group keeps its hash-ordered greedy PREFIX of docs
    * while the running token total stays within ⌊weight·tokenBudget⌋
    * (the first doc that would cross the boundary, and everything after
    * it, is dropped — prefix semantics keep membership a pure function
    * of (group, hash order, budget), so a re-run or engine change can
    * never swap which docs fill the budget).
    *
    * Token counts are a caller-supplied column — the [[Packing]]
    * contract: this operator never tokenizes, so the mixture is
    * faithful to whatever tokenizer produced the counts.
    *
    * Scale shape: same as [[sampleToWeights]] — [[TopK.perGroup]]
    * bounds every group at `maxDocsPerGroup` rows before the exact
    * running-sum window (≤ bound rows per group per task cross the
    * shuffle; set the bound from your corpus' minimum doc length —
    * budget/minTokens docs can never underfill).
    *
    * Returns (groupCol, idCol, tokenCol, cum_tokens). */
  def sampleToTokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, weights: Map[String, Double], tokenBudget: Long,
      maxDocsPerGroup: Int = 1 << 20): DataFrame = {
    require(weights.nonEmpty, "need at least one group weight")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0,1]: $weights")
    require(maxDocsPerGroup > 0, "maxDocsPerGroup must be positive")
    val quotas = weights.map { case (g, w) =>
      (g, (BigDecimal(w.toString) * BigDecimal(tokenBudget))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }
    require(quotas.values.max > 0,
      "all token quotas are zero — raise tokenBudget or weights")
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = quotas.toSeq.toDF(groupCol, "__quota")
    val ranked = df.select(col(groupCol), col(idCol), col(tokenCol),
      md5(col(idCol).cast("string")).as("__rk"))
    val bounded = TopK.perGroup(ranked, Seq(groupCol), "__rk",
      k = maxDocsPerGroup, desc = false, tieBreak = Seq(idCol))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounded.join(broadcast(qdf), Seq(groupCol))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      .filter(col("cum_tokens") <= col("__quota"))
      .select(col(groupCol), col(idCol), col(tokenCol), col("cum_tokens"))
  }
}
