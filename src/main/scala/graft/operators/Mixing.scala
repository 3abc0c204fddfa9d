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

  /** Caller-supplied-weight → quota math, shared by [[sampleToWeights]]
    * and [[sampleToTokenBudget]].
    *
    * Exact decimal floor: budget*w in doubles truncates one unit short
    * whenever the product lands just under the integer (0.58*50 =
    * 28.999…96 → 28, not 29). BigDecimal of the weight's decimal text
    * keeps ⌊weight·budget⌋ exact for any budget. ([[
    * sampleToTemperature]] derives its quotas by exact division instead
    * — its weights are ratios of data-derived doubles, where the
    * decimal-text route loses the ulp that the division keeps.) */
  private def quotasOfWeights(weights: Map[String, Double],
      budget: Long): Map[String, Long] = {
    require(weights.nonEmpty, "need at least one group weight")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be fractions in [0,1]: $weights")
    weights.map { case (g, w) =>
      (g, (BigDecimal(w.toString) * BigDecimal(budget))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
    }
  }

  /** Shared scaffolding of every mixing form: md5 ranking, TopKPerGroup
    * bound, broadcast quota join. ONE definition — the ranking hash and
    * tie-break are the cross-engine determinism contract, and the
    * operators must never diverge on them. */
  private def rankBoundAndQuota(df: DataFrame, groupCol: String,
      idCol: String, extraCols: Seq[String], quotas: Map[String, Long],
      boundOf: Long => Int): DataFrame = {
    require(quotas.nonEmpty && quotas.values.max > 0,
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
      weights: Map[String, Double], budget: Long): DataFrame =
    sampleToQuotas(df, groupCol, idCol, quotasOfWeights(weights, budget))

  /** Doc-count mixing with explicit per-group quotas — the shared tail
    * of [[sampleToWeights]] and [[sampleToTemperature]], which differ
    * only in how the quota map is derived. */
  def sampleToQuotas(df: DataFrame, groupCol: String, idCol: String,
      quotas: Map[String, Long]): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(col("__rk").asc, col(idCol).asc)
    rankBoundAndQuota(df, groupCol, idCol, Nil, quotas,
      boundOf = { maxQ =>
        require(maxQ <= Int.MaxValue, s"quota $maxQ exceeds Int range")
        maxQ.toInt // the doc quota IS the exact per-group bound
      })
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__quota"))
      .select(col(groupCol), col(idCol))
  }

  /** Temperature-scaled mixing: group weights derived from the corpus
    * itself, w_g ∝ n_g^alpha — the multilingual up-sampling rule of the
    * public mBERT/XLM-R recipes (Devlin et al. 2019 §"data"; Conneau et
    * al. 2020 eq. 1). `alpha = 1` keeps natural proportions, `alpha = 0`
    * is uniform over groups, and 0 < alpha < 1 up-samples the tail
    * relative to the head without letting any group dominate.
    *
    * True group counts come from one partial-agg job collected to the
    * driver — ≤ |groups| rows, the same driver-side cardinality as the
    * weights Map every other mixing form already takes (a corpus has
    * thousands of sources, not billions); the collect is BOUNDED by
    * `maxGroups` with a loud raise, so a mistakenly data-sized
    * groupCol cannot OOM the driver. Quotas are
    * ⌊budget · n_g^alpha / Z⌋ computed by EXACT decimal division (34
    * digits), NOT via a normalized double weight: 200 docs of 300 at
    * alpha 1 must quota ⌊budget·2/3⌋ exactly, and the double 0.6666…
    * is one ulp short — through the weight path a 150-doc budget would
    * yield 99, not 100. Membership then rides [[sampleToQuotas]], so
    * the ranking hash and tie-break stay the one shared definition.
    *
    * Cross-engine note: n^alpha and the normalizing sum are IEEE-double
    * computations; for a HASH-gated replica pick fixtures where they are
    * exact (perfect-square counts at alpha = 0.5 make sqrt, Z, and the
    * division all exact — see the driver gate). The operator itself is
    * deterministic for any alpha on any corpus. */
  def sampleToTemperature(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, budget: Long, maxGroups: Int = 100000): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1]: $alpha")
    require(maxGroups > 0, s"maxGroups must be positive: $maxGroups")
    // BOUNDED collect (the StreamOps limit(cap+1)+require pattern): a
    // high-cardinality groupCol (doc id by mistake) must raise loudly,
    // not OOM the driver
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
      .limit(maxGroups + 1)
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    require(counts.length <= maxGroups,
      s"sampleToTemperature: more than $maxGroups groups — a " +
        "temperature mixture is over sources/languages, not a " +
        "data-sized key; check groupCol or raise maxGroups")
    require(counts.nonEmpty, "sampleToTemperature: empty corpus")
    // sort before summing: Z must not depend on result-row order
    val pow = counts.sortBy(_._1)
      .map { case (g, n) => g -> math.pow(n.toDouble, alpha) }
    val z = BigDecimal(pow.map(_._2).sum)
    val quotas = pow.map { case (g, p) =>
      g -> (BigDecimal(budget) * BigDecimal(p) / z)
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }.toMap
    sampleToQuotas(df, groupCol, idCol, quotas)
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
    rankBoundAndQuota(df, groupCol, idCol, Seq(tokenCol),
        quotasOfWeights(weights, tokenBudget),
        boundOf = _ => maxDocsPerGroup)
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
