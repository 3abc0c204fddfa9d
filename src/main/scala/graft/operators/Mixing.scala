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

  /** Shared scaffolding of both mixing forms: exact-decimal
    * ⌊weight·budget⌋ quotas, md5 ranking, TopKPerGroup bound, broadcast
    * quota join. ONE definition — the ranking hash, floor math, and
    * tie-break are the cross-engine determinism contract, and the two
    * operators must never diverge on them.
    *
    * Exact decimal floor: budget*w in doubles truncates one unit short
    * whenever the product lands just under the integer (0.58*50 =
    * 28.999…96 → 28, not 29). BigDecimal of the weight's decimal text
    * keeps ⌊weight·budget⌋ exact for any budget. */
  private def rankBoundAndQuota(df: DataFrame, groupCol: String,
      idCol: String, extraCols: Seq[String], weights: Map[String, Double],
      budget: Long, boundOf: Long => Int): DataFrame = {
    require(weights.nonEmpty, "need at least one group weight")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0,1]: $weights")
    val quotas = weights.map { case (g, w) =>
      (g, (BigDecimal(w.toString) * BigDecimal(budget))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }
    require(quotas.values.max > 0,
      "all quotas are zero — raise budget or weights")
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = quotas.toSeq.toDF(groupCol, "__quota")
    val ranked = df.select((Seq(groupCol, idCol) ++ extraCols).map(col) :+
      md5(col(idCol).cast("string")).as("__rk"): _*)
    val bounded = TopK.perGroup(ranked, Seq(groupCol), "__rk",
      k = boundOf(quotas.values.max), desc = false, tieBreak = Seq(idCol))
    bounded.join(broadcast(qdf), Seq(groupCol))
  }

  /** @param weights group value → target fraction of `budget`; groups
    *                absent from the map are dropped (weight 0)
    * @param budget  total docs wanted; each group contributes
    *                ⌊weight·budget⌋ docs (fewer if the group is smaller)
    */
  def sampleToWeights(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rk").asc, col(idCol).asc)
    rankBoundAndQuota(df, groupCol, idCol, Nil, weights, budget,
      boundOf = { maxQ =>
        require(maxQ <= Int.MaxValue, s"quota $maxQ exceeds Int range")
        maxQ.toInt // the doc quota IS the exact per-group bound
      })
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
    * budget/minTokens docs can never underfill). A group that hits the
    * bound while its quota is still unfilled FAILS LOUDLY (in-plan
    * raise_error, zero extra jobs) rather than silently delivering a
    * fraction of the specified mixture.
    *
    * Returns (groupCol, idCol, tokenCol, cum_tokens). */
  def sampleToTokenBudget(df: DataFrame, groupCol: String, idCol: String,
      tokenCol: String, weights: Map[String, Double], tokenBudget: Long,
      maxDocsPerGroup: Int = 1 << 20): DataFrame = {
    require(maxDocsPerGroup > 0, "maxDocsPerGroup must be positive")
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // whole-partition stats ride the same exchange as the running sum
    val wAll = Window.partitionBy(groupCol)
    // true group sizes (one partial-agg job to ≤ |weights| rows): a
    // group of EXACTLY maxDocsPerGroup docs is exhausted, not
    // truncated — the bound alone cannot tell the two apart, and a
    // group smaller than its quota is the accepted take-it-all case
    val sizes = df.groupBy(groupCol)
      .agg(count(lit(1)).as("__gsize"))
    rankBoundAndQuota(df, groupCol, idCol, Seq(tokenCol), weights,
        tokenBudget, boundOf = _ => maxDocsPerGroup)
      .join(broadcast(sizes), Seq(groupCol))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      // truncation guard: TopK actually CUT the group (raw size past
      // the bound) AND the kept prefix's total stayed under quota — the
      // true prefix extends past what was kept, so the mixture would
      // silently underfill
      .withColumn("__guard", when(
        col("__gsize") > maxDocsPerGroup &&
          max(col("cum_tokens")).over(wAll) < col("__quota"),
        raise_error(concat(lit("sampleToTokenBudget: group '"),
          col(groupCol),
          lit(s"' hit maxDocsPerGroup=$maxDocsPerGroup before filling " +
            "its token quota — raise maxDocsPerGroup")))))
      .filter(col("__guard").isNull && col("cum_tokens") <= col("__quota"))
      .select(col(groupCol), col(idCol), col(tokenCol), col("cum_tokens"))
  }
}
