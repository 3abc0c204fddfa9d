package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a corpus — the
  * Population Stability Index (PSI), the standard drift monitor of
  * production ML pipelines (credit-scoring lineage; ubiquitous in
  * data-quality gates): for a bucketed feature,
  * `PSI = Σ_buckets (p_b − q_b) · ln(p_b / q_b)` with p from the
  * baseline snapshot and q from the candidate. Rule-of-thumb bands:
  * < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.
  *
  * Laplace smoothing (`+s` per bucket over the UNION of observed
  * buckets) keeps buckets present in only one snapshot finite — an
  * unsmoothed empty bucket makes PSI infinite and the monitor useless
  * the day a new bucket appears.
  *
  * Scale shape: one partial-agg count per snapshot (shuffles carry
  * (group, bucket, count)), a full-outer bucket join, per-group totals
  * by a second tiny aggregate on the bucket table (bucket cardinality ≪
  * rows), map-only term arithmetic. Snapshots never join row-to-row.
  *
  * FP discipline (NOTES.md taxonomy): counts are exact integers, each
  * bucket's term is division + ln — bit-identical per engine — and the
  * per-group PSI rounds at 6dp, safe because ln outputs are
  * transcendental (no decimal-boundary population).
  */
object Drift {

  /** Per-group PSI between snapshots `a` (baseline) and `b`.
    *
    * @param bucketCol integer-ish bucket id column present in both
    *                  inputs (pre-bucket the feature: `n_tokens div 10`,
    *                  a quantile bin, a category code)
    * @return (groupCols…, n_buckets, n_a, n_b, psi) — n_* are raw row
    *         counts, n_buckets the union bucket count
    */
  def psi(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      bucketCol: String, smoothing: Double = 1.0): DataFrame = {
    def counts(df: DataFrame) =
      df.groupBy((groupCols.map(col) :+ col(bucketCol).as("__bk")): _*)
        .agg(count(lit(1)).as("__cnt"))
    psiFromCounts(counts(a), counts(b), groupCols, "__bk", "__cnt",
      smoothing)
  }

  /** PSI from pre-aggregated (group, bucket, count) tables — the core
    * behind [[psi]], exposed for callers that already hold histograms
    * (a streaming windowed state snapshot, a stored profile): the
    * snapshots themselves never have to be re-scanned. Inputs carry
    * `groupCols ++ (bucketCol, cntCol)`; semantics and FP discipline
    * are exactly [[psi]]'s. */
  def psiFromCounts(aCounts: DataFrame, bCounts: DataFrame,
      groupCols: Seq[String], bucketCol: String, cntCol: String,
      smoothing: Double = 1.0): DataFrame = {
    require(smoothing > 0, s"smoothing must be > 0, got $smoothing")
    val g = groupCols.map(col)
    def norm(df: DataFrame, tag: String) =
      df.select((g :+ col(bucketCol).as("__bk")
        :+ col(cntCol).cast("long").as(s"__c$tag")): _*)
    // null-safe full outer on (group, bucket): a null group key (or null
    // bucket) present in both snapshots must merge into ONE bucket row —
    // plain equality would split it and double-count toward n_buckets
    val keys = groupCols :+ "__bk"
    val ca = norm(aCounts, "a")
    // rename the right side's keys up front: psi(df, df, …) is a legal
    // self-compare, and unrenamed ca(k)<=>cb(k) trips Spark's
    // ambiguous-self-join detection
    val cb = keys.foldLeft(norm(bCounts, "b")) {
      (d, k) => d.withColumnRenamed(k, s"__r_$k") }
    val cond = keys.map(k => col(k) <=> col(s"__r_$k")).reduce(_ && _)
    val joined = ca.join(cb, cond, "full_outer")
      .select(keys.map(k => coalesce(col(k), col(s"__r_$k")).as(k)) ++
        Seq(col("__ca"), col("__cb")): _*)
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = joined.groupBy(g: _*)
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    val s = lit(smoothing)
    // groupCols may be empty (global PSI): an empty using-columns join
    // is NOT a conditioned join — the one-row totals must cross-join.
    // Non-empty: null-safe equality, so the null group keeps its totals.
    // The totals side's keys are renamed BEFORE the join — totals
    // derives from `joined`, so joined(k) <=> totals(k) resolves both
    // sides to the same attribute id and Catalyst logs its "trivially
    // true equals predicate" WARN while silently rewriting the
    // condition (the r9 bench-tail 'lang == lang' finding)
    val withTotals =
      if (groupCols.isEmpty) joined.crossJoin(broadcast(totals))
      else {
        val tot = groupCols.foldLeft(totals) {
          (d, k) => d.withColumnRenamed(k, s"__t_$k") }
        joined.join(broadcast(tot),
            groupCols.map(k => col(k) <=> col(s"__t_$k")).reduce(_ && _))
          .drop(groupCols.map(k => s"__t_$k"): _*)
      }
    withTotals
      .withColumn("__p", (col("__ca") + s) /
        (col("n_a") + s * col("n_buckets")))
      .withColumn("__q", (col("__cb") + s) /
        (col("n_b") + s * col("n_buckets")))
      .withColumn("__term",
        (col("__p") - col("__q")) * log(col("__p") / col("__q")))
      .groupBy(g: _*)
      .agg(first(col("n_buckets")).as("n_buckets"),
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        round(sum(col("__term")), 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between snapshots `a` and
    * `b` on a numeric column: `D = max_v |F_a(v) − F_b(v)|` over the
    * pooled empirical CDFs — the unbinned complement to [[psi]] (no
    * bucket design needed, sensitive to any distributional change, and
    * `√((n_a·n_b)/(n_a+n_b))·D` feeds the standard significance
    * tables).
    *
    * Scale shape (the [[Sequence.assignGlobalSeq]] discipline): counts
    * collapse to one row per DISTINCT value, the running CDFs are
    * per-`bucket` windows plus a bucket-offset window that runs over
    * bucket COUNTS (one row per bucket — the only unpartitioned window,
    * trivial by construction). `bucket` must be a coarsening of the
    * value order (e.g. `floor(v / 1000)`); skew bounds per-task sort
    * size exactly as in assignGlobalSeq. Value rows never sort in one
    * task.
    *
    * FP discipline: CDF values are single IEEE divisions of exact long
    * counts — bit-identical cross-engine — and D is a max (no
    * summation order), so the RAW statistic hashes. Empty snapshots
    * raise in-plan (a 0-denominator KS is meaningless, not zero).
    *
    * @return one row: (n_a, n_b, d_stat, d_value) — d_value is the
    *         smallest value achieving the max (deterministic argmax)
    */
  def ks(a: DataFrame, b: DataFrame, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, tag: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("__v"))
        .agg(count(lit(1)).as(s"__c$tag"))
    val ca = counts(a, "a")
    val cb = counts(b, "b").withColumnRenamed("__v", "__rv")
    val merged = ca.join(cb, col("__v") === col("__rv"), "full_outer")
      .select(coalesce(col("__v"), col("__rv")).as("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__bk", bucket(col("__v")))
    // per-bucket totals → prefix offsets (tiny bounded window — see
    // Bounded.constPart for the marker idiom)
    val wOff = Window.partitionBy(Bounded.constPart(col("__ta")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = merged.groupBy(col("__bk"))
      .agg(sum("__ca").as("__ta"), sum("__cb").as("__tb"))
      .withColumn("__oa", coalesce(sum(col("__ta")).over(wOff), lit(0L)))
      .withColumn("__ob", coalesce(sum(col("__tb")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__oa"), col("__ob"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .select(col("__v"),
        (col("__oa") + sum(col("__ca")).over(wIn)).as("__cuma"),
        (col("__ob") + sum(col("__cb")).over(wIn)).as("__cumb"))
    // global aggregates produce ONE row even on empty input, so the
    // empty-snapshot guard below cannot be pruned away by AQE's
    // empty-relation propagation (a guard on the crossJoin's streamed
    // side would vanish with it when both snapshots are empty)
    val totals = cum.groupBy()
      .agg(coalesce(max("__cuma"), lit(0L)).as("n_a"),
        coalesce(max("__cumb"), lit(0L)).as("n_b"))
      .select(
        when(col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
          "Drift.ks: empty snapshot — the KS statistic needs both " +
            "samples non-empty"))).otherwise(col("n_a")).as("n_a"),
        col("n_b"))
    val diffAgg = cum.crossJoin(broadcast(totals))
      .withColumn("__diff", abs(
        col("__cuma").cast("double") / col("n_a").cast("double") -
          col("__cumb").cast("double") / col("n_b").cast("double")))
      .groupBy()
      .agg(max(col("__diff")).as("d_stat"),
        min_by(col("__v"), struct((-col("__diff")).as("nd"),
          col("__v").as("v"))).as("d_value"))
    totals.crossJoin(diffAgg)
      .select(col("n_a"), col("n_b"), col("d_stat"), col("d_value"))
  }

  /** Mann–Whitney U rank-sum test (two-sided, tie-corrected, no
    * continuity correction) — the nonparametric "did this distribution
    * shift" companion to [[ks]]: U is location-sensitive where KS is
    * shape-sensitive.
    *
    * Distributed shape = the [[ks]] discipline: collapse BOTH samples
    * to distinct values with per-sample counts (the only corpus-scale
    * shuffle), then run the two-phase running count (per-bucket totals
    * → broadcast prefix offsets → in-bucket windows) — NO global sort
    * of raw rows, no single-partition window over the data.
    *
    * Exactness: tie-averaged ranks live in DOUBLED integer space
    * (rank2 = 2·|{w < v}| + m + 1), so every rank sum is an exact
    * DECIMAL(38,0); U = (Σ ca·rank2 − n_a(n_a+1)) / 2.0 is one exact
    * subtraction and one exact halving — bit-identical cross-engine.
    * The z statistic is a fixed IEEE op sequence over those exact
    * inputs, rounded 9dp like the PageRank tier. Degenerate inputs
    * fail loudly: an empty sample (U undefined) or zero rank variance
    * (every value tied — z would be 0/0).
    *
    * @return one row: (n_a, n_b, r_a, u_a, u_b, tie_sum, z)
    */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def counts(df: DataFrame, tag: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("__v"))
        .agg(count(lit(1)).as(s"__c$tag"))
    val merged = counts(a, "a")
      .join(counts(b, "b").withColumnRenamed("__v", "__rv"),
        col("__v") === col("__rv"), "full_outer")
      .select(coalesce(col("__v"), col("__rv")).as("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__m", col("__ca") + col("__cb"))
      .withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tm")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = merged.groupBy(col("__bk"))
      .agg(sum("__m").as("__tm"))
      .withColumn("__om", coalesce(sum(col("__tm")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__om"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranked = merged.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__cumbefore",
        col("__om") + sum(col("__m")).over(wIn) - col("__m"))
      // doubled average rank of the __m copies of __v — exact integer
      .withColumn("__rank2",
        lit(2L) * col("__cumbefore") + col("__m") + lit(1L))
    val agg = ranked.groupBy()
      .agg(coalesce(sum("__ca"), lit(0L)).as("n_a"),
        coalesce(sum("__cb"), lit(0L)).as("n_b"),
        coalesce(sum(col("__ca").cast(dec) * col("__rank2").cast(dec)),
          lit(0L).cast(dec)).as("__ra2"),
        coalesce(sum(col("__m").cast(dec) * col("__m").cast(dec) *
          col("__m").cast(dec) - col("__m").cast(dec)),
          lit(0L).cast(dec)).as("__tie"))
    // the guards sit ON the 1-row global aggregate (the AQE
    // empty-relation lesson: a guard behind a join can be pruned)
    val guarded = agg.select(
      when(col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
        "Drift.mannWhitney: empty sample — U is undefined")))
        .when(col("n_a").cast("double") * col("n_b").cast("double")
          > 4.5e15, raise_error(lit(
          "Drift.mannWhitney: n_a*n_b too large for an exact double U")))
        .otherwise(col("n_a")).as("n_a"),
      col("n_b"), col("__ra2"), col("__tie"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nn = (col("n_a") + col("n_b")).cast("double")
    val u2 = col("__ra2") - (col("n_a") * (col("n_a") + lit(1L))).cast(dec)
    val uA = u2.cast("double") / lit(2.0)
    val uB = naD * nbD - uA
    val varU = (naD * nbD / lit(12.0)) *
      ((nn + lit(1.0)) - col("__tie").cast("double") / (nn * (nn - lit(1.0))))
    guarded.select(col("n_a"), col("n_b"),
      (col("__ra2").cast("double") / lit(2.0)).as("r_a"),
      uA.as("u_a"), uB.as("u_b"),
      col("__tie").cast("double").as("tie_sum"),
      when(varU <= 0.0, raise_error(lit(
        "Drift.mannWhitney: zero rank variance — every value tied")))
        .otherwise(round((uA - naD * nbD / lit(2.0)) / sqrt(varU), 9))
        .as("z"))
  }

  /** Welch's unequal-variance t-test (two-sided statistic +
    * Welch–Satterthwaite degrees of freedom) — the parametric
    * "did the MEAN move" companion to [[mannWhitney]] (rank shift) and
    * [[ks]] (shape): the A/B-measurement primitive every experiment
    * pipeline needs, robust to unequal group variances where Student's
    * pooled test is not.
    *
    * Distributed shape: ONE partial-aggregating pass per sample — no
    * join, no window, no distinct-value table; each side contributes
    * (n, Σcents, Σcents² split hi/lo). The hi/lo 32-bit split is the
    * [[Features.corrMatrix]] recipe: per-row `cents²` stays in exact
    * long space, the two half-sums cannot wrap below 2³¹ rows, and the
    * moments reassemble once driver-free in the 1-row plan.
    *
    * Exactness: values are 2-dp money scaled to integer cents
    * (|cents| ≤ ⌊√2⁶³⌋ guarded in-plan, the corrMatrix bound). Means
    * and variances are fixed IEEE chains over those exact integer
    * moments — bit-identical cross-engine — and `t` / `df` round at
    * 9dp (the [[mannWhitney]] z discipline: the inputs are exact, the
    * rounding only shields against oracle op-order drift).
    *
    * Degenerate inputs fail loudly on the 1-row aggregate (the AQE
    * empty-relation lesson): either sample with n < 2 (variance
    * undefined) or BOTH variances zero (t is 0/0).
    *
    * @return one row: (n_a, n_b, mean_a, mean_b, var_a, var_b, t, df)
    */
  /** [[welchT]] for EVERY segment at once — the experiment-platform
    * sweep ("t per metric × segment cell"): one partial-agg pass over
    * the whole table computes both arms' moments per group via
    * conditional aggregation (no join, no pivot, no second scan), then
    * the same fixed IEEE chains per group row.
    *
    * Degenerate cells are DROPPED, not raised (one undersized segment
    * must not kill a thousand-cell sweep): a group needs n ≥ 2 in BOTH
    * arms and non-zero pooled variance; the `n_a`/`n_b` columns of
    * surviving rows make the filter auditable, and rows belonging to
    * neither arm value are ignored.
    *
    * @param armCol column holding the arm labels; `armA`/`armB` select
    *               the two treatment values
    * @return one row per surviving group: (groupCols…, n_a, n_b,
    *         mean_a, mean_b, var_a, var_b, t, df) */
  def welchTByGroup(df: DataFrame, groupCols: Seq[String],
      armCol: String, armA: String, armB: String, valueCol: String)
      : DataFrame = {
    require(groupCols.nonEmpty, "welchTByGroup: use welchT for a " +
      "single comparison")
    require(armA != armB, "welchTByGroup: arms must differ")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cents = when(cents0.isNull && col(valueCol).isNotNull,
        raise_error(lit(
          s"Drift.welchTByGroup: $valueCol overflows long cents")))
      .when(abs(cents0) > 3037000499L, raise_error(lit(
        "Drift.welchTByGroup: |cents| beyond the exact-square bound " +
          "(shard and merge moments)")))
      .otherwise(cents0)
    val sq = cents * cents
    def arm(v: String, c: org.apache.spark.sql.Column) =
      sum(when(col(armCol) === v, c).otherwise(lit(0L)))
    def moments(tag: String, v: String) = Seq(
      sum(when(col(armCol) === v, 1L).otherwise(0L)).as(s"n_$tag"),
      arm(v, cents).as(s"__s_$tag"),
      arm(v, shiftright(sq, 32)).as(s"__hi_$tag"),
      arm(v, sq.bitwiseAND(lit(0xffffffffL))).as(s"__lo_$tag"))
    val aggs = moments("a", armA) ++ moments("b", armB)
    val m = df
      .filter(col(valueCol).isNotNull &&
        (col(armCol) === armA || col(armCol) === armB))
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      // same 2^31 arm bound welchT raises: the lo-half sum of squared
      // cents (each < 2^32) wraps a signed long once an arm exceeds
      // ~2.1B rows — per GROUP here, the variant most likely to meet
      // it at scale. Loud, not silent (round-11 ADVICE fix)
      .withColumn("n_a",
        when(col("n_a") > 2147483647L || col("n_b") > 2147483647L,
          raise_error(lit(
            "Drift.welchTByGroup: arm beyond 2^31 rows in a group — " +
              "shard the input and merge the (mergeable) moment sums")))
          .otherwise(col("n_a")))
    val B = lit(4294967296L)
    def meanD(tag: String) =
      col(s"__s_$tag").cast("double") / (lit(100.0) * col(s"n_$tag"))
    def varD(tag: String) = {
      val sumSq = col(s"__hi_$tag").cast(dec) * B.cast(dec) +
        col(s"__lo_$tag").cast(dec)
      val num = col(s"n_$tag").cast(dec) * sumSq -
        col(s"__s_$tag").cast(dec) * col(s"__s_$tag").cast(dec)
      num.cast("double") /
        (col(s"n_$tag").cast("double") * (col(s"n_$tag") - 1) *
          lit(10000.0))
    }
    val withV = m.withColumn("mean_a", meanD("a"))
      .withColumn("mean_b", meanD("b"))
      .withColumn("var_a", varD("a"))
      .withColumn("var_b", varD("b"))
      .filter(col("var_a") + col("var_b") > 0.0)
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    withV.select(groupCols.map(col) ++ Seq(col("n_a"), col("n_b"),
      col("mean_a"), col("mean_b"), col("var_a"), col("var_b"),
      round((col("mean_a") - col("mean_b")) / sqrt(sa + sb), 9).as("t"),
      round((sa + sb) * (sa + sb) /
        (sa * sa / (col("n_a") - 1) + sb * sb / (col("n_b") - 1)), 9)
        .as("df")): _*)
  }

  /** Two-proportion pooled z-test — the BINARY-metric A/B companion to
    * [[welchT]] (means) and [[mannWhitney]] (rank shift): "did the
    * filter pass-rate move between pipeline versions", "did CTR move
    * between arms". `z = (p̂_a − p̂_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))`
    * with the pooled `p̂ = (s_a+s_b)/(n_a+n_b)`.
    *
    * Shape: ONE conditional partial-agg scan (the [[welchTByGroup]]
    * discipline) — four exact longs out, the statistic a fixed IEEE
    * chain over them, rounded 9dp. Rows outside both arms are ignored;
    * a NULL success flag drops its row (it is neither a success nor a
    * failure).
    *
    * Degenerate inputs raise on the 1-row aggregate: an empty arm, or
    * a pooled rate of exactly 0 or 1 (zero variance — z undefined).
    *
    * @param successCol BOOLEAN column (the conversion/pass flag)
    * @return one row: (n_a, n_b, s_a, s_b, p_a, p_b, z) */
  def propZTest(df: DataFrame, armCol: String, armA: String,
      armB: String, successCol: String): DataFrame = {
    require(armA != armB, "propZTest: arms must differ")
    def arm(v: String, c: org.apache.spark.sql.Column) =
      coalesce(sum(when(col(armCol) === v, c).otherwise(lit(0L))), lit(0L))
    val s = col(successCol).cast("boolean")
    val m = df
      .filter(s.isNotNull &&
        (col(armCol) === armA || col(armCol) === armB))
      .agg(
        arm(armA, lit(1L)).as("n_a"), arm(armB, lit(1L)).as("n_b"),
        arm(armA, when(s, 1L).otherwise(0L)).as("s_a"),
        arm(armB, when(s, 1L).otherwise(0L)).as("s_b"))
    val guarded = m.select(
      when(col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
        "Drift.propZTest: empty arm — z is undefined")))
        .when(col("s_a") + col("s_b") === 0 ||
          col("s_a") + col("s_b") === col("n_a") + col("n_b"),
          raise_error(lit(
            "Drift.propZTest: pooled rate is 0 or 1 — zero variance, " +
              "z is undefined")))
        .otherwise(col("n_a")).as("n_a"),
      col("n_b"), col("s_a"), col("s_b"))
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val pa = col("s_a").cast("double") / naD
    val pb = col("s_b").cast("double") / nbD
    val pool = (col("s_a") + col("s_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    guarded.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
      pa.as("p_a"), pb.as("p_b"),
      round((pa - pb) / sqrt(pool * (lit(1.0) - pool) *
        (lit(1.0) / naD + lit(1.0) / nbD)), 9).as("z"))
  }

  /** Kruskal–Wallis H (rank one-way ANOVA, tie-corrected) — the
    * k-GROUP generalization of [[mannWhitney]]: "did ANY of these k
    * pipeline variants shift the metric's distribution", the screen an
    * experiment platform runs before drilling into pairwise tests.
    *
    * Distributed shape: one shuffle to (group, value) cells; the
    * global ranks ride the distinct-VALUE table (the [[mannWhitney]]
    * two-phase recipe: per-bucket totals → broadcast prefix offsets →
    * in-bucket windows, no global sort); per-group rank sums come from
    * one cells⋈ranks equi-join. The cross-group reduction
    * `Σ R_g²/n_g` is a SORTED SEQUENTIAL FOLD over the per-group terms
    * (collect_list + sort_array + aggregate): group count is bounded
    * (`maxGroups`, raised loudly), and the fixed fold order makes the
    * IEEE sum bit-identical cross-engine where a parallel sum is not.
    *
    * Exactness: doubled average ranks (rank2 = 2·|{w<v}| + m + 1) keep
    * every per-group rank sum an exact DECIMAL(38,0); each fold term
    * is one cast + multiply + divide; H and its tie correction are one
    * fixed IEEE chain over those terms, shipped RAW (every op is
    * rational/IEEE-deterministic — rounding could only introduce a
    * boundary, NOTES taxonomy).
    *
    * Loud degenerates: fewer than 2 groups, more than `maxGroups`
    * groups (the fold's one-row collect must stay bounded), all values
    * tied (tie correction hits 0 — H is 0/0).
    *
    * @param bucket maps a value to its rank-phase bucket id (the
    *               [[mannWhitney]] contract: monotonic in the value)
    * @return one row: (n, k, h, eta2_h) — eta2_h the eta-squared-H
    *         effect size (H − k + 1)/(n − k) (Tomczak & Tomczak's
    *         η²[H]; NOT epsilon-squared, which is H/(n−1) — the
    *         column is named for the formula it computes, matching
    *         the [[anovaF]] eta2 precedent) */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxGroups: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val vals = cells.groupBy(col("__v")).agg(sum("__c").as("__m"))
      .withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tm")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = vals.groupBy(col("__bk")).agg(sum("__m").as("__tm"))
      .withColumn("__om", coalesce(sum(col("__tm")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__om"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vals.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__rank2",
        lit(2L) * (col("__om") + sum(col("__m")).over(wIn) - col("__m"))
          + col("__m") + lit(1L))
      .select(col("__v").as("__rv"), col("__rank2"))
    val perG = cells.join(ranked, col("__v") === col("__rv"))
      .groupBy(col("__g"))
      .agg(sum("__c").as("__ng"),
        sum(col("__c").cast(dec) * col("__rank2").cast(dec)).as("__r2g"))
    val ties = vals.agg(coalesce(
      sum(col("__m").cast(dec) * col("__m").cast(dec) *
        col("__m").cast(dec) - col("__m").cast(dec)),
      lit(0L).cast(dec)).as("__tie"))
    // per-group fold term BEFORE the collect: (R2_g)²/n_g in double off
    // the exact decimal (decimal→double is correctly rounded; the
    // oracle's VARCHAR roundtrip matches it past 2^53)
    val term = col("__r2g").cast("double") * col("__r2g").cast("double") /
      col("__ng").cast("double")
    val folded = perG.agg(
      count(lit(1)).as("k"),
      coalesce(sum("__ng"), lit(0L)).as("n"),
      sort_array(collect_list(struct(col("__g").as("g"), term.as("t"))))
        .as("__terms"))
    val g = folded.crossJoin(ties).select(
      coalesce(col("n"), lit(0L)).as("n"),
      when(col("k") < 2, raise_error(lit(
        "Drift.kruskalWallis: need at least 2 groups")))
        .when(col("k") > maxGroups, raise_error(concat(
          lit(s"Drift.kruskalWallis: more than $maxGroups groups " +
            "(the fold collects one term per group) — got "),
          col("k").cast("string"))))
        .otherwise(col("k")).as("k"),
      aggregate(transform(col("__terms"), x => x.getField("t")),
        lit(0.0), (acc, x) => acc + x).as("__s"),
      col("__tie"))
    val nD = col("n").cast("double")
    val h0 = lit(3.0) * col("__s") / (nD * (nD + lit(1.0))) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) -
      col("__tie").cast("double") / (nD * nD * nD - nD)
    val out = g.select(col("n"), col("k"),
      when(corr <= 0.0, raise_error(lit(
        "Drift.kruskalWallis: every value tied — H is undefined")))
        .otherwise(h0 / corr).as("h"))
    // eta-squared-H effect size (round 12; renamed from eps2 in round
    // 13 — (H-k+1)/(n-k) is Tomczak & Tomczak's eta²[H], not
    // epsilon-squared): the "how big" number a report pairs with H —
    // one extra IEEE chain off the emitted columns
    out.withColumn("eta2_h",
      (col("h") - col("k").cast("double") + lit(1.0)) /
        (col("n").cast("double") - col("k").cast("double")))
  }

  /** One-way ANOVA F — the PARAMETRIC k-group companion to
    * [[kruskalWallis]] (means, not rank shift) and the k-group
    * generalization of the pooled t-test [[welchT]] approximates
    * pairwise: `F = (SS_between/(k−1)) / (SS_within/(N−k))`.
    *
    * Distributed shape: ONE conditional partial-agg scan to per-group
    * exact moments (n, Σcents, Σcents² hi/lo-split — the [[welchT]]
    * recipe, so per-row squares never leave exact long space), then
    * the bounded sorted fold of `Σ S_g²/n_g` (the [[kruskalWallis]]
    * cross-group discipline) on the one-row aggregate. No join of data
    * rows, no window.
    *
    * Exactness: group moments are exact integers (cents bound raised
    * in-plan, per-group 2^31 row bound raised on the aggregate — the
    * welchTByGroup ADVICE lesson); SS terms and F are one fixed IEEE
    * chain over them, shipped RAW (pure rational — NOTES taxonomy).
    * `ss_between`/`ss_within` are reported in squared VALUE units
    * (cents² / 1e4).
    *
    * @return one row: (n, k, ss_between, ss_within, f, eta2) —
    *         eta2 the variance share SS_between/(SS_between+SS_within) */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String,
      maxGroups: Int = 10000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cents = when(cents0.isNull && col(valueCol).isNotNull,
        raise_error(lit(
          s"Drift.anovaF: $valueCol overflows long cents")))
      .when(abs(cents0) > 3037000499L, raise_error(lit(
        "Drift.anovaF: |cents| beyond the exact-square bound " +
          "(shard and merge moments)")))
      .otherwise(cents0)
    val sq = cents * cents
    val perG = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__ng"),
        sum(cents.cast(dec)).as("__sg"),
        sum(shiftright(sq, 32)).as("__hi"),
        sum(sq.bitwiseAND(lit(0xffffffffL))).as("__lo"))
      // the lo-half wraps a signed long past ~2.1B rows per group —
      // loud, not silent (the welchTByGroup lesson)
      .withColumn("__ng",
        when(col("__ng") > 2147483647L, raise_error(lit(
          "Drift.anovaF: group beyond 2^31 rows — shard the input " +
            "and merge the (mergeable) moment sums")))
          .otherwise(col("__ng")))
    val B = lit(4294967296L)
    val sumSq = col("__hi").cast(dec) * B.cast(dec) + col("__lo").cast(dec)
    val term = col("__sg").cast("double") * col("__sg").cast("double") /
      col("__ng").cast("double")
    val folded = perG.agg(
      count(lit(1)).as("k"),
      coalesce(sum("__ng"), lit(0L)).as("n"),
      coalesce(sum(col("__sg")), lit(0L).cast(dec)).as("__s"),
      coalesce(sum(sumSq), lit(0L).cast(dec)).as("__q"),
      sort_array(collect_list(struct(col("__g").as("g"), term.as("t"))))
        .as("__terms"))
    val g = folded.select(
      col("n"),
      when(col("k") < 2, raise_error(lit(
        "Drift.anovaF: need at least 2 groups")))
        .when(col("k") > maxGroups, raise_error(concat(
          lit(s"Drift.anovaF: more than $maxGroups groups — got "),
          col("k").cast("string"))))
        .when(col("n") <= col("k"), raise_error(lit(
          "Drift.anovaF: need n > k for a within-group variance")))
        .otherwise(col("k")).as("k"),
      aggregate(transform(col("__terms"), x => x.getField("t")),
        lit(0.0), (acc, x) => acc + x).as("__t"),
      col("__s"), col("__q"))
    val nD = col("n").cast("double")
    val ssb = col("__t") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val ssw = col("__q").cast("double") - col("__t")
    val kD = col("k").cast("double")
    val out = g.select(col("n"), col("k"),
      (ssb / lit(10000.0)).as("ss_between"),
      when(ssw <= 0.0, raise_error(lit(
        "Drift.anovaF: zero within-group variance — F is undefined")))
        .otherwise(ssw / lit(10000.0)).as("ss_within"),
      ((ssb / (kD - lit(1.0))) / (ssw / (nD - kD))).as("f"))
    // eta-squared effect size (round 12): variance share explained by
    // the grouping — one division over the emitted SS columns
    out.withColumn("eta2",
      col("ss_between") / (col("ss_between") + col("ss_within")))
  }

  /** Brown–Forsythe test (Levene's test with median centers) — the
    * variance-homogeneity screen a user runs BEFORE trusting
    * [[anovaF]]'s pooled within-group variance: "do these k pipeline
    * variants differ in SPREAD, not just mean". W is the one-way
    * ANOVA F computed on the absolute deviations from each group's
    * MEDIAN (`z_ij = |x_ij − med_j|` — Brown & Forsythe 1974's robust
    * form; mean centers are the classic Levene and break under skew).
    *
    * Distributed shape: distinct-VALUE collapse to (group, cents,
    * count) cells; per-group medians ride the [[Selection
    * .groupedQuantiles]] two-phase recipe (per-(group, bucket) count
    * totals → prefix offsets via a group-partitioned window over
    * BUCKETS, in-bucket windows over distinct values, rank-probe
    * join) — no per-group sort of raw rows, group count unbounded
    * until the final fold; the deviations rejoin the CELLS (weighted
    * by count), never raw rows; then the [[anovaF]] moment fold.
    *
    * Exactness: the interpolated median is carried DOUBLED
    * (`med2 = v@⌈n/2⌉ + v@(⌊n/2⌋+1)`, an exact long in cents), so
    * `z2 = |2·cents − med2|` is an exact long in half-cents; weighted
    * moments Σc·z2 and Σc·z2² are exact DECIMAL(38,0); the SS terms
    * and W are one fixed IEEE chain over them, shipped RAW. SS columns
    * are reported in squared VALUE units (half-cents²/4e4).
    *
    * Loud degenerates: fewer than 2 groups, more than `maxGroups`
    * (the fold's one-row collect must stay bounded), n ≤ k, and zero
    * within-group deviation spread (every |deviation| equal — W is
    * 0/0).
    *
    * @param bucket maps a cents value to its median-phase bucket id
    *               (the [[Selection.groupedQuantiles]] contract:
    *               monotonic in the value)
    * @return one row: (n, k, ss_between, ss_within, w) */
  def leveneBF(df: DataFrame, groupCol: String, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxGroups: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cents = when(cents0.isNull && col(valueCol).isNotNull,
        raise_error(lit(
          s"Drift.leveneBF: $valueCol overflows long cents")))
      .when(abs(cents0) > 3037000499L, raise_error(lit(
        "Drift.leveneBF: |cents| beyond the exact-square bound " +
          "(shard and merge moments)")))
      .otherwise(cents0)
    val cells = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"),
        cents.as("__v"))
      .agg(count(lit(1)).as("__c"))
    // per-group interpolated median, doubled — the groupedQuantiles
    // two-phase over (group, bucket) so no group ever sorts its raw
    // distinct-value set in one task
    val counts = cells.withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.groupBy(col("__g"), col("__bk"))
      .agg(sum("__c").as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__g").as("__og"), col("__bk").as("__bk2"),
        col("__off"))
    val wIn = Window.partitionBy(col("__g"), col("__bk"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .join(offs, col("__g") <=> col("__og") && col("__bk") <=> col("__bk2"))
      .select(col("__g"), col("__v"),
        (col("__off") + sum(col("__c")).over(wIn)).as("__cum"))
    // the two central ranks: ⌈n/2⌉ and ⌊n/2⌋+1 (equal when n is odd —
    // the probe rows are TAGGED so the odd case still sums v twice)
    val nRow = cum.groupBy(col("__g")).agg(max("__cum").as("__n"))
    val rks = nRow.select(col("__g").as("__rg"),
      explode(array(
        struct(lit(1).as("i"), ((col("__n") + 1L) - pmod(col("__n") + 1L,
          lit(2L))).divide(2L).cast("long").as("r")),
        struct(lit(2).as("i"), ((col("__n") - pmod(col("__n"), lit(2L)))
          .divide(2L).cast("long") + 1L).as("r")))).as("__qr"))
      .select(col("__rg"), col("__qr.i").as("__i"), col("__qr.r").as("__r"))
    val med = cum.join(rks,
        col("__g") <=> col("__rg") && col("__cum") >= col("__r"))
      .groupBy(col("__rg"), col("__i"))
      .agg(min(col("__v")).as("__mv"))
      .groupBy(col("__rg")).agg(sum("__mv").as("__med2"))
    // deviations in half-cents over the CELLS (weighted), exact longs
    val z = cells.join(med, col("__g") <=> col("__rg"))
      .select(col("__g"), col("__c"),
        abs(lit(2L) * col("__v") - col("__med2")).as("__z"))
    val perG = z.groupBy(col("__g"))
      .agg(sum("__c").as("__ng"),
        sum(col("__c").cast(dec) * col("__z").cast(dec)).as("__sg"),
        sum(col("__c").cast(dec) * col("__z").cast(dec) *
          col("__z").cast(dec)).as("__qg"))
    val term = col("__sg").cast("double") * col("__sg").cast("double") /
      col("__ng").cast("double")
    val folded = perG.agg(
      count(lit(1)).as("k"),
      coalesce(sum("__ng"), lit(0L)).as("n"),
      coalesce(sum(col("__sg")), lit(0L).cast(dec)).as("__s"),
      coalesce(sum(col("__qg")), lit(0L).cast(dec)).as("__q"),
      sort_array(collect_list(struct(col("__g").as("g"), term.as("t"))))
        .as("__terms"))
    val g = folded.select(
      col("n"),
      when(col("k") < 2, raise_error(lit(
        "Drift.leveneBF: need at least 2 groups")))
        .when(col("k") > maxGroups, raise_error(concat(
          lit(s"Drift.leveneBF: more than $maxGroups groups — got "),
          col("k").cast("string"))))
        .when(col("n") <= col("k"), raise_error(lit(
          "Drift.leveneBF: need n > k for a within-group spread")))
        .otherwise(col("k")).as("k"),
      aggregate(transform(col("__terms"), x => x.getField("t")),
        lit(0.0), (acc, x) => acc + x).as("__t"),
      col("__s"), col("__q"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("__t") -
      col("__s").cast("double") * col("__s").cast("double") / nD
    val ssw = col("__q").cast("double") - col("__t")
    val out = g.select(col("n"), col("k"),
      (ssb / lit(40000.0)).as("ss_between"),
      when(ssw <= 0.0, raise_error(lit(
        "Drift.leveneBF: zero within-group deviation spread — W is " +
          "undefined")))
        .otherwise(ssw / lit(40000.0)).as("ss_within"))
    // W off the EMITTED columns (one extra IEEE chain, the eta2
    // precedent) so the oracle's replay is the identical expression
    out.withColumn("w",
      (col("ss_between") / (col("k").cast("double") - lit(1.0))) /
        (col("ss_within") / (col("n").cast("double") -
          col("k").cast("double"))))
  }

  /** Jonckheere–Terpstra trend test — the ORDERED-alternative member
    * of the k-group family ([[kruskalWallis]] asks "did ANY group
    * shift"; this asks "does the metric rise ACROSS the given group
    * order" — quality across ingest months, latency across load
    * tiers): `J = Σ_{i<j} U_ij` over ordered group pairs, z-scored
    * with the tie-corrected null variance (Lehmann's three-term
    * formula — every term an exact integer sum here).
    *
    * Distributed shape: distinct-value collapse to (group, value,
    * count) cells; per-group cumulative counts ride the
    * [[kruskalWallis]] two-phase (per-(group, bucket) totals → prefix
    * offsets → in-bucket windows); the union-value × k GRID (k ≤ 64
    * groups, broadcast) turns the 2-D dominance count into one
    * bounded window per value (≤ k rows per partition); the pair
    * count `Σ c·(2·less_lower + ties_lower)` is ONE exact-decimal
    * aggregate. No group-pair joins, no k² plans.
    *
    * Exactness: 2J and every moment sum (group sizes, tie masses) are
    * exact DECIMAL(38,0); z is one fixed IEEE chain over their
    * correctly-rounded double casts, shipped RAW.
    *
    * Loud degenerates: a group value outside `groupOrder` (an
    * unmapped group would silently bias J), fewer than 2 ordered
    * groups present, N < 3 (the variance has an (N−2) factor), every
    * value tied (z is 0/0).
    *
    * @param groupOrder the hypothesized ascending group order; must
    *                   cover every group present
    * @return one row: (n, k, j, z) — j in ½ steps (tie halves) */
  def jonckheereTerpstra(df: DataFrame, groupCol: String,
      valueCol: String, groupOrder: Seq[String],
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    require(groupOrder.nonEmpty && groupOrder.size <= 64,
      s"jonckheereTerpstra: groupOrder size must be in [1, 64]: " +
        s"${groupOrder.size}")
    require(groupOrder.distinct.size == groupOrder.size,
      "jonckheereTerpstra: duplicate group in groupOrder")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells0 = df
      .filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"),
        col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val gidx = spark.createDataFrame(
      groupOrder.zipWithIndex.map { case (g, i) => (g, i) })
      .toDF("__og", "__gi")
    val cells = cells0.join(broadcast(gidx),
        col("__g") <=> col("__og"), "left")
      .select(col("__v"), col("__c"),
        when(col("__gi").isNull, raise_error(concat(lit(
          "Drift.jonckheereTerpstra: group not in groupOrder: "),
          col("__g"))))
          .otherwise(col("__gi")).as("__gi"))
    // the union-value × k GRID (absent slots carry count 0): each
    // group's strictly-below-v count is then ONE cumulative over the
    // union value axis per group — the kruskalWallis two-phase,
    // group-keyed — valid at every union value, not just the group's
    // own values
    val vals = cells.select(col("__v")).distinct()
    val grid = vals.crossJoin(broadcast(
        gidx.select(col("__gi").as("__ggi"))))
      .join(cells.select(col("__gi").as("__cgi"), col("__v").as("__cv"),
          col("__c").as("__cc")),
        col("__v") <=> col("__cv") && col("__ggi") <=> col("__cgi"),
        "left")
      .select(col("__v"), col("__ggi").as("__gi"),
        coalesce(col("__cc"), lit(0L)).as("__c"))
    val gridBk = grid.withColumn("__bk", bucket(col("__v")))
    val wFillOff = Window.partitionBy(col("__gi")).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val fillOffs = gridBk.groupBy(col("__gi"), col("__bk"))
      .agg(sum("__c").as("__t"))
      .withColumn("__foff",
        coalesce(sum(col("__t")).over(wFillOff), lit(0L)))
      .select(col("__gi").as("__fgi"), col("__bk").as("__fbk"),
        col("__foff"))
    val wFillIn = Window.partitionBy(col("__gi"), col("__bk"))
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = gridBk
      .join(fillOffs, col("__gi") <=> col("__fgi") && col("__bk") <=> col("__fbk"))
      .select(col("__v"), col("__gi"), col("__c"),
        (col("__foff") + sum(col("__c")).over(wFillIn) - col("__c"))
          .as("__below"))
    // per-value window over the ≤ k ordered groups: what sits in
    // LOWER-ordered groups strictly below / tied at v
    val wLow = Window.partitionBy(col("__v")).orderBy(col("__gi"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val low = filled
      .withColumn("__lowless", coalesce(sum(col("__below")).over(wLow),
        lit(0L)))
      .withColumn("__lowties", coalesce(sum(col("__c")).over(wLow),
        lit(0L)))
      .filter(col("__c") > 0)
    val j2Row = low.agg(coalesce(sum(col("__c").cast(dec) *
      (lit(2L).cast(dec) * col("__lowless").cast(dec) +
        col("__lowties").cast(dec))), lit(0L).cast(dec)).as("__j2"))
    // moment sums — all exact integers, order-free
    val perG = cells.groupBy(col("__gi")).agg(sum("__c").as("__n"))
    val gAgg = perG.agg(
      count(lit(1)).as("k"),
      coalesce(sum("__n"), lit(0L)).as("n"),
      coalesce(sum(col("__n").cast(dec) * col("__n").cast(dec)),
        lit(0L).cast(dec)).as("__sn2"),
      coalesce(sum(col("__n").cast(dec) * (col("__n") - 1L).cast(dec) *
        (lit(2L).cast(dec) * col("__n").cast(dec) + lit(5L).cast(dec))),
        lit(0L).cast(dec)).as("__sn25"),
      coalesce(sum(col("__n").cast(dec) * (col("__n") - 1L).cast(dec) *
        (col("__n") - 2L).cast(dec)), lit(0L).cast(dec)).as("__sn12"),
      coalesce(sum(col("__n").cast(dec) * (col("__n") - 1L).cast(dec)),
        lit(0L).cast(dec)).as("__sn1"))
    val ties = cells.groupBy(col("__v")).agg(sum("__c").as("__m"))
      .agg(
        count(lit(1)).as("__nv"),
        coalesce(sum(col("__m").cast(dec) * (col("__m") - 1L).cast(dec) *
          (lit(2L).cast(dec) * col("__m").cast(dec) +
            lit(5L).cast(dec))), lit(0L).cast(dec)).as("__st25"),
        coalesce(sum(col("__m").cast(dec) * (col("__m") - 1L).cast(dec) *
          (col("__m") - 2L).cast(dec)), lit(0L).cast(dec)).as("__st12"),
        coalesce(sum(col("__m").cast(dec) * (col("__m") - 1L).cast(dec)),
          lit(0L).cast(dec)).as("__st1"))
    val g = j2Row.crossJoin(gAgg).crossJoin(ties)
    val nDec = col("n").cast(dec)
    val mu2 = nDec * nDec - col("__sn2")
    val aT = nDec * (nDec - lit(1L).cast(dec)) *
      (lit(2L).cast(dec) * nDec + lit(5L).cast(dec)) -
      col("__sn25") - col("__st25")
    val bT = col("__sn12") * col("__st12")
    val cT = col("__sn1") * col("__st1")
    val den1 = (lit(9L).cast(dec) * nDec * (nDec - lit(1L).cast(dec)) *
      (nDec - lit(2L).cast(dec)))
    val den2 = (lit(2L).cast(dec) * nDec * (nDec - lit(1L).cast(dec)))
    val sig2x4 = aT.cast("double") / lit(18.0) +
      bT.cast("double") / den1.cast("double") +
      cT.cast("double") / den2.cast("double")
    g.select(
      when(col("n") < 3, raise_error(lit(
        "Drift.jonckheereTerpstra: need n >= 3 (the variance has an " +
          "(n-2) factor)")))
        .otherwise(col("n")).as("n"),
      when(col("k") < 2, raise_error(lit(
        "Drift.jonckheereTerpstra: need at least 2 ordered groups " +
          "present")))
        .otherwise(col("k")).as("k"),
      (col("__j2").cast("double") / lit(2.0)).as("j"),
      // z = (J − μ)/σ computed ×4 to stay exact-integer until the one
      // division: 4J = 2·(2J), 4μ = N² − Σn², 4σ = √(4·(4σ²))
      when(col("__nv") < 2 || sig2x4 <= 0.0, raise_error(lit(
        "Drift.jonckheereTerpstra: zero null variance (every value " +
          "tied) — z is 0/0")))
        .otherwise((lit(2L).cast(dec) * col("__j2") - mu2).cast("double")
          / sqrt(lit(4.0) * sig2x4))
        .as("z"))
  }

  /** Cliff's delta — the nonparametric EFFECT SIZE companion to
    * [[mannWhitney]]'s significance: `δ = P(a > b) − P(a < b) =
    * 2U_a/(n_a·n_b) − 1`, the "how big is the shift" number a test
    * report needs next to the z (|δ| ≲ 0.147 negligible / 0.33 small /
    * 0.474 medium — Romano et al.'s bands).
    *
    * Distributed shape and exactness are [[mannWhitney]]'s verbatim:
    * distinct-value collapse, two-phase running count over the B-side
    * counts, `2U_a = Σ ca·(2·|{b<v}| + ties_b)` an exact
    * DECIMAL(38,0), δ ONE exact-integer division shipped RAW (a raw
    * IEEE quotient is bit-identical; rounding a possibly-terminating
    * rational is the boundary hazard — NOTES taxonomy).
    *
    * @return one row: (n_a, n_b, u_a, delta) */
  def cliffsDelta(a: DataFrame, b: DataFrame, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def counts(df: DataFrame, tag: String) =
      df.filter(col(valueCol).isNotNull)
        .groupBy(col(valueCol).as("__v"))
        .agg(count(lit(1)).as(s"__c$tag"))
    val merged = counts(a, "a")
      .join(counts(b, "b").withColumnRenamed("__v", "__rv"),
        col("__v") === col("__rv"), "full_outer")
      .select(coalesce(col("__v"), col("__rv")).as("__v"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tb")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = merged.groupBy(col("__bk"))
      .agg(sum("__cb").as("__tb"))
      .withColumn("__ob", coalesce(sum(col("__tb")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__ob"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = merged.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__bBefore",
        col("__ob") + sum(col("__cb")).over(wIn) - col("__cb"))
      .groupBy()
      .agg(coalesce(sum("__ca"), lit(0L)).as("n_a"),
        coalesce(sum("__cb"), lit(0L)).as("n_b"),
        coalesce(sum(col("__ca").cast(dec) *
          (lit(2L) * col("__bBefore") + col("__cb")).cast(dec)),
          lit(0L).cast(dec)).as("__u2"))
    val guarded = agg.select(
      when(col("n_a") === 0 || col("n_b") === 0, raise_error(lit(
        "Drift.cliffsDelta: empty sample — delta is undefined")))
        .otherwise(col("n_a")).as("n_a"),
      col("n_b"), col("__u2"))
    val nab = col("n_a").cast(dec) * col("n_b").cast(dec)
    guarded.select(col("n_a"), col("n_b"),
      (col("__u2").cast("double") / lit(2.0)).as("u_a"),
      ((col("__u2") - nab).cast("double") / nab.cast("double"))
        .as("delta"))
  }

  /** Wilcoxon signed-rank test — the PAIRED numeric companion to
    * [[mannWhitney]] (and to [[Eval.mcnemar]]'s paired-binary form):
    * "did this metric move between the two measurements of the SAME
    * unit" (a customer's spend across two periods, a doc's quality
    * score across two pipeline versions). Zero differences drop (the
    * standard treatment); `W⁺` sums the |d|-ranks of positive
    * differences; z is tie-corrected, no continuity correction.
    *
    * Distributed shape: one (|d|, sign) cell shuffle, ranks over the
    * distinct-|d| table via the two-phase cum recipe — no global sort,
    * no per-row rank. Exactness: differences are exact cents longs
    * (bound raised in-plan), doubled ranks keep `2·W⁺` an exact
    * DECIMAL(38,0), and z is one fixed IEEE chain
    * `(W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − Σ(t³−t)/48)` over
    * exact-integer casts, shipped RAW (rational + IEEE-exact sqrt).
    *
    * Loud degenerates: every pair tied (n = 0 after zero-drop), or
    * zero rank variance (a single distinct |d| CAN still have
    * variance; the guard fires only when the tie term consumes it).
    *
    * @param bucket maps |d| in cents to its rank-phase bucket id
    * @return one row: (n, n_zero, w_plus, z, r_rb) — r_rb the
    *         matched-pairs rank-biserial effect size (2W+ − S)/S */
  def wilcoxonSignedRank(df: DataFrame, xCol: String, yCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def cents(c: String) = {
      val v = floor(col(c) * 100 + lit(0.5)).cast("long")
      when(v.isNull && col(c).isNotNull, raise_error(lit(
        s"Drift.wilcoxonSignedRank: $c overflows long cents")))
        .when(abs(v) > 4.5e15, raise_error(lit(
          s"Drift.wilcoxonSignedRank: |$c| beyond the exact-diff bound")))
        .otherwise(v)
    }
    val d = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select((cents(xCol) - cents(yCol)).as("__d"))
    val nz = d.agg(coalesce(sum(when(col("__d") === 0, 1L)
      .otherwise(0L)), lit(0L)).as("n_zero"))
    val cells = d.filter(col("__d") =!= 0)
      .groupBy(abs(col("__d")).as("__a"))
      .agg(count(lit(1)).as("__m"),
        coalesce(sum(when(col("__d") > 0, 1L).otherwise(0L)), lit(0L))
          .as("__mp"))
      .withColumn("__bk", bucket(col("__a")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tm")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = cells.groupBy(col("__bk")).agg(sum("__m").as("__tm"))
      .withColumn("__om", coalesce(sum(col("__tm")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__om"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__a"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = cells.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__rank2",
        lit(2L) * (col("__om") + sum(col("__m")).over(wIn) - col("__m"))
          + col("__m") + lit(1L))
      .agg(coalesce(sum("__m"), lit(0L)).as("n"),
        coalesce(sum(col("__mp").cast(dec) * col("__rank2").cast(dec)),
          lit(0L).cast(dec)).as("__w2"),
        coalesce(sum(col("__m").cast(dec) * col("__m").cast(dec) *
          col("__m").cast(dec) - col("__m").cast(dec)),
          lit(0L).cast(dec)).as("__tie"))
    val g = agg.crossJoin(nz).select(
      when(col("n") === 0, raise_error(lit(
        "Drift.wilcoxonSignedRank: every pair tied — W is undefined")))
        .otherwise(col("n")).as("n"),
      col("n_zero"), col("__w2"), col("__tie"))
    val nD = col("n").cast(dec)
    val meanD = (nD * (nD + 1)).cast("double") / lit(4.0)
    val varD = (nD * (nD + 1) * (nD * 2 + 1)).cast("double") / lit(24.0) -
      col("__tie").cast("double") / lit(48.0)
    val wPlus = col("__w2").cast("double") / lit(2.0)
    val out = g.select(col("n"), col("n_zero"), wPlus.as("w_plus"),
      when(varD <= 0.0, raise_error(lit(
        "Drift.wilcoxonSignedRank: zero rank variance")))
        .otherwise((wPlus - meanD) / sqrt(varD)).as("z"))
    // matched-pairs rank-biserial r (round 12): (W+ − W−)/S =
    // (2W+ − S)/S with S = n(n+1)/2 the total rank sum — the effect
    // size next to the z, exact decimals in, one IEEE chain out
    val sTot = (col("n").cast(dec) * (col("n").cast(dec) + 1))
      .cast("double") / lit(2.0)
    out.withColumn("r_rb",
      (lit(2.0) * col("w_plus") - sTot) / sTot)
  }

  /** Friedman test — the k-treatment PAIRED/blocked rank test that
    * completes the matrix ([[mannWhitney]] = 2 unpaired,
    * [[wilcoxonSignedRank]] = 2 paired, [[kruskalWallis]] = k
    * unpaired): "did ANY of k pipeline variants move the metric when
    * every block (doc, customer, day) saw all k variants".
    * `χ²_F = [12/(n·k·(k+1))]·ΣR_j² − 3·n·(k+1)` over per-treatment
    * rank sums, tie-corrected by `1 − Σ(t³−t)/(n·k·(k²−1))` (tie
    * terms per block).
    *
    * Shape: ONE groupBy(block) shuffle collects each block's k
    * (treatment, value) cells; ranks are IN-ROW array arithmetic
    * (doubled tie-averaged rank = 2·|{w<v}| + |{w=v}| + 1 — k² work
    * per block, k bounded by contract), then one explode + a
    * k-row treatment aggregate. Unlike [[kruskalWallis]] there is NO
    * cross-group float fold: ΣR_j² = Σ(2R_j)²/4 stays an exact
    * DECIMAL(38,0) because every doubled rank sum is an integer — the
    * whole statistic is one fixed IEEE chain over exact integers,
    * shipped RAW.
    *
    * Loud degenerates: k < 2, fewer than 1 complete block, any block
    * with a duplicate treatment or a missing one (Friedman needs a
    * complete balanced design; incomplete blocks DROP — they carry no
    * within-block ranking — and the emitted n makes the drop
    * auditable), every block internally tied (zero variance).
    *
    * @param k the exact number of treatments each block must carry
    * @return one row: (n_blocks, k, chi2_f) */
  /** Shared block-wise doubled mid-rank recipe of [[friedman]] and
    * [[pageTrend]]: distinct-cell collapse, the duplicate-cell raise,
    * the exactly-k-treatments block filter, and in-row doubled
    * tie-averaged ranks rank2(x) = 2|{w<x}| + |{w=x}| + 1 (k²
    * comparisons per block, all inside one collected k-array).
    * Returns exploded (__t, __r2, __eq). */
  private def blockRanks(df: DataFrame, blockCol: String,
      treatmentCol: String, valueCol: String, k: Int,
      op: String): DataFrame = {
    val cells = df.filter(col(blockCol).isNotNull &&
        col(treatmentCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(blockCol).as("__b"),
        col(treatmentCol).cast("string").as("__t"))
      .agg(count(lit(1)).as("__c"), min(col(valueCol)).as("__v"))
    // a duplicate (block, treatment) raises via the referenced count;
    // blocks that don't carry EXACTLY k distinct treatments drop
    val blocks = cells
      .groupBy(col("__b"))
      .agg(max("__c").as("__dup"), count(lit(1)).as("__nt"),
        collect_list(struct(col("__t"), col("__v"))).as("__cells"))
      .select(
        when(col("__dup") > 1, raise_error(lit(
          s"Drift.$op: duplicate (block, treatment) row")))
          .otherwise(col("__nt")).as("__nt"),
        col("__cells"))
      .filter(col("__nt") === k)
    // tie term Σ(t³−t) over the block's value multiset =
    // Σ_cells (eq² − 1) where eq = |{w = x}|
    val ranked = blocks.select(
      transform(col("__cells"), c => struct(
        c.getField("__t").as("t"),
        (lit(2L) * size(filter(col("__cells"),
          w => w.getField("__v") < c.getField("__v"))).cast("long") +
          size(filter(col("__cells"),
            w => w.getField("__v") === c.getField("__v"))).cast("long") +
          lit(1L)).as("r2"),
        (size(filter(col("__cells"),
          w => w.getField("__v") === c.getField("__v"))).cast("long"))
          .as("eq"))).as("__rk"))
    ranked.select(explode(col("__rk")).as("__e"))
      .select(col("__e.t").as("__t"), col("__e.r2").as("__r2"),
        col("__e.eq").as("__eq"))
  }

  def friedman(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"friedman: need k >= 2 treatments, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val exploded = blockRanks(df, blockCol, treatmentCol, valueCol, k,
      "friedman")
    val perT = exploded.groupBy(col("__t"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__r2").cast(dec)).as("__r2s"))
    val tie = exploded.agg(coalesce(
      sum(col("__eq").cast(dec) * col("__eq").cast(dec) - 1),
      lit(0L).cast(dec)).as("__tie"))
    val folded = perT.agg(
      count(lit(1)).as("__kt"),
      coalesce(max("__nb"), lit(0L)).as("n_blocks"),
      coalesce(sum(col("__r2s") * col("__r2s")), lit(0L).cast(dec))
        .as("__r2sq"))
    val g = folded.crossJoin(tie).select(
      when(col("__kt") === 0, raise_error(lit(
        "Drift.friedman: no complete blocks")))
        // k-sized blocks over MORE than k total treatments would mix
        // incomparable designs (block1 = {A,B}, block2 = {B,C})
        .when(col("__kt") =!= k, raise_error(lit(
          "Drift.friedman: blocks disagree on the treatment set")))
        .otherwise(col("n_blocks")).as("n_blocks"),
      lit(k.toLong).as("k"), col("__r2sq"), col("__tie"))
    val nD = col("n_blocks").cast("double")
    val kD = lit(k.toDouble)
    // ΣR_j² = Σ(2R_j)²/4 — the /4 folds into the 12 ⇒ 3·Σ(2R)²
    val chi0 = lit(3.0) * col("__r2sq").cast("double") /
      (nD * kD * (kD + lit(1.0))) - lit(3.0) * nD * (kD + lit(1.0))
    val corr = lit(1.0) - col("__tie").cast("double") /
      (nD * kD * (kD * kD - lit(1.0)))
    g.select(col("n_blocks"), col("k"),
      when(corr <= 0.0, raise_error(lit(
        "Drift.friedman: every block internally tied — chi2 is " +
          "undefined")))
        .otherwise(chi0 / corr).as("chi2_f"))
  }

  /** Benjamini–Hochberg FDR control — the multiple-comparisons step a
    * monitoring sweep runs AFTER the per-segment tests ([[welchTByGroup]],
    * per-segment drift screens): given one p-value per hypothesis, flag
    * the rejections whose expected false-discovery rate stays ≤ `alpha`.
    * Standard step-up rule: sort p ascending, find the LARGEST k with
    * `p_(k) ≤ k·α/m`, reject everything ≤ p_(k).
    *
    * Distributed shape: the distinct-p collapse + two-phase cumulative
    * (the [[mannWhitney]] rank recipe — p ∈ [0,1] so the phase bucket
    * is the fixed 1024-grid, no caller knob); tied p-values share their
    * HIGHEST rank, which is exactly the index the step-up rule wants;
    * the cutoff is one 1-row aggregate broadcast back over the input —
    * flags are map-only, no global sort anywhere.
    *
    * Exactness: the threshold comparison `p ≤ (rank·α)/m` is one
    * multiply + one divide over exact longs and the caller's p — a
    * fixed IEEE chain an oracle replays bit-identically. The flags are
    * then boolean, so the gate carries no float column at all beyond p
    * itself.
    *
    * Loud degenerates: a NULL p raises (a dropped hypothesis would
    * shrink m and loosen every threshold silently); p outside [0,1]
    * raises.
    *
    * @param groupCols optional hypothesis FAMILIES — the correction
    *                   then runs independently per group (per-segment
    *                   sweeps corrected within their own family), with
    *                   per-group m and cutoff
    * @return the input columns + `rejected` (false everywhere when no
    *         hypothesis clears the rule) */
  def benjaminiHochberg(df: DataFrame, pCol: String,
      alpha: Double = 0.05, groupCols: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val pRaw = col(pCol).cast("double")
    val guarded = df.withColumn("__p",
      when(pRaw.isNull, raise_error(lit(
        "Drift.benjaminiHochberg: NULL p-value — every hypothesis " +
          "needs one (dropping it would silently loosen every " +
          "threshold)")))
        .when(pRaw < 0.0 || pRaw > 1.0, raise_error(concat(lit(
          "Drift.benjaminiHochberg: p outside [0,1]: "),
          pRaw.cast("string"))))
        .otherwise(pRaw))
    val vals = guarded.groupBy(g :+ col("__p").as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__bk", floor(col("__v") * 1024))
    val offPart =
      if (g.isEmpty) Seq(Bounded.constPart(col("__tm"))) else g
    val wOff = Window.partitionBy(offPart: _*)
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // derived sides rename their keys before rejoining (the r9
    // ngramJaccard trivially-true-predicate trap)
    val offs = vals.groupBy(g :+ col("__bk"): _*)
      .agg(sum("__c").as("__tm"))
      .withColumn("__om", coalesce(sum(col("__tm")).over(wOff), lit(0L)))
      .select(groupCols.map(c => col(c).as(s"__og_$c")) ++
        Seq(col("__bk").as("__bk2"), col("__om")): _*)
    val wIn = Window.partitionBy(g :+ col("__bk"): _*)
      .orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offKeys = (groupCols.map(c => col(c) <=> col(s"__og_$c")) :+
      (col("__bk") <=> col("__bk2"))).reduce(_ && _)
    // inclusive cumulative count = the highest rank among the __c ties
    val ranked = vals.join(broadcast(offs), offKeys)
      .withColumn("__rhi", col("__om") + sum(col("__c")).over(wIn))
    val m1 = guarded.groupBy(g: _*).agg(count(lit(1)).as("__m"))
      .select(groupCols.map(c => col(c).as(s"__mg_$c")) :+
        col("__m"): _*)
    val mKeys = groupCols.map(c => col(c) <=> col(s"__mg_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val cut = ranked.join(broadcast(m1), mKeys)
      .filter(col("__v") <=
        col("__rhi").cast("double") * lit(alpha) /
          col("__m").cast("double"))
      .groupBy(g: _*).agg(max(col("__v")).as("__cut"))
      .select(groupCols.map(c => col(c).as(s"__cg_$c")) :+
        col("__cut"): _*)
    val cutKeys = groupCols.map(c => col(c) <=> col(s"__cg_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    guarded.join(broadcast(cut), cutKeys, "left")
      .withColumn("rejected", coalesce(col("__p") <= col("__cut"),
        lit(false)))
      .drop(("__p" +: "__cut" +:
        groupCols.map(c => s"__cg_$c")): _*)
  }

  def welchT(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def moments(df: DataFrame, tag: String) = {
      val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
      val cents = when(cents0.isNull && col(valueCol).isNotNull,
          raise_error(lit(s"Drift.welchT: $valueCol overflows long cents")))
        .when(abs(cents0) > 3037000499L, raise_error(lit(
          s"Drift.welchT: |cents| beyond the exact-square bound " +
            s"(shard and merge moments)")))
        .otherwise(cents0)
      val sq = cents * cents
      df.filter(col(valueCol).isNotNull).select(cents.as("__c"), sq.as("__q"))
        .agg(count(lit(1)).as(s"n_$tag"),
          coalesce(sum(col("__c")), lit(0L)).as(s"__s_$tag"),
          coalesce(sum(shiftright(col("__q"), 32)), lit(0L))
            .as(s"__hi_$tag"),
          coalesce(sum(col("__q").bitwiseAND(lit(0xffffffffL))), lit(0L))
            .as(s"__lo_$tag"))
    }
    val B = lit(4294967296L) // 2^32
    def meanD(tag: String) =
      col(s"__s_$tag").cast("double") / (lit(100.0) * col(s"n_$tag"))
    // sample variance in DOLLARS²: (n·Σc² − (Σc)²) / (n(n−1)·100²),
    // numerator exact in DECIMAL(38,0) reassembled from the halves
    def varD(tag: String) = {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sumSq = col(s"__hi_$tag").cast(dec) * B.cast(dec) +
        col(s"__lo_$tag").cast(dec)
      val num = col(s"n_$tag").cast(dec) * sumSq -
        col(s"__s_$tag").cast(dec) * col(s"__s_$tag").cast(dec)
      num.cast("double") /
        (col(s"n_$tag").cast("double") * (col(s"n_$tag") - 1) * lit(10000.0))
    }
    val m = moments(a, "a").crossJoin(moments(b, "b"))
      .select(
        when(col("n_a") < 2 || col("n_b") < 2, raise_error(lit(
          "Drift.welchT: each sample needs n >= 2")))
          // the corrMatrix bound: the lo-half sum stays wrap-free
          // only below 2^31 rows — shard and merge moments beyond
          .when(col("n_a") > 2147483647L || col("n_b") > 2147483647L,
            raise_error(lit(
              "Drift.welchT: sample beyond 2^31 rows — shard the " +
                "input and merge the (mergeable) moment sums")))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"), meanD("a").as("mean_a"), meanD("b").as("mean_b"),
        varD("a").as("var_a"), varD("b").as("var_b"))
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    m.select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
      col("var_a"), col("var_b"),
      when(col("var_a") + col("var_b") === 0.0, raise_error(lit(
        "Drift.welchT: zero variance in both samples — t undefined")))
        .otherwise(round((col("mean_a") - col("mean_b")) / sqrt(sa + sb), 9))
        .as("t"),
      round((sa + sb) * (sa + sb) /
        (sa * sa / (col("n_a") - 1) + sb * sb / (col("n_b") - 1)), 9)
        .as("df"))
  }

  /** Cochran–Armitage trend test — the ORDERED-alternative member of
    * the PROPORTIONS family ([[Eval.cochranQ]] asks "did any paired
    * treatment shift the success rate"; chi² asks "are the strata
    * rates unequal"; this asks "does the success rate RISE across the
    * given stratum order" — defect rate across ingest months, positive
    * rate across quality tiers). With integer scores s_i = 0..k−1 over
    * the ordered strata, n_i trials and r_i successes per stratum:
    * `z = (N·Σs_i r_i − R·Σs_i n_i) · √N /
    *      √(R·(N−R)·(N·Σs_i²n_i − (Σs_i n_i)²))`
    * — the standard trend z with every radicand factor an exact
    * integer (the N-scaled form clears all divisions), so z is ONE
    * fixed IEEE chain over exact DECIMAL(38,0) sums, shipped RAW.
    *
    * Distributed shape: one groupBy to the ≤ 64 stratum cells
    * (count, successes), one broadcast score join, one global
    * aggregate. Null stratum/outcome rows are filtered (the
    * kruskal/jonckheere convention for rank-family tests).
    *
    * Loud degenerates: a stratum outside `strataOrder`, fewer than 2
    * strata present, all-success or all-failure (the variance is 0 —
    * z is 0/0).
    *
    * @param strataOrder hypothesized ascending stratum order; must
    *                    cover every stratum present
    * @return one row: (n, k, n_success, z) */
  def cochranArmitage(df: DataFrame, stratumCol: String,
      successCol: String, strataOrder: Seq[String]): DataFrame = {
    require(strataOrder.nonEmpty && strataOrder.size <= 64,
      s"cochranArmitage: strataOrder size must be in [1, 64]: " +
        s"${strataOrder.size}")
    require(strataOrder.distinct.size == strataOrder.size,
      "cochranArmitage: duplicate stratum in strataOrder")
    val spark = df.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells0 = df
      .filter(col(stratumCol).isNotNull && col(successCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(col(successCol).cast("boolean").cast("long")).as("__r"))
    val gidx = spark.createDataFrame(
      strataOrder.zipWithIndex.map { case (g, i) => (g, i.toLong) })
      .toDF("__og", "__s")
    val cells = cells0.join(broadcast(gidx),
        col("__g") <=> col("__og"), "left")
      .select(col("__n"), col("__r"),
        when(col("__s").isNull, raise_error(concat(lit(
          "Drift.cochranArmitage: stratum not in strataOrder: "),
          col("__g"))))
          .otherwise(col("__s")).as("__s"))
    val g = cells.agg(
      count(lit(1)).as("k"),
      coalesce(sum("__n"), lit(0L)).cast(dec).as("__N"),
      coalesce(sum("__r"), lit(0L)).cast(dec).as("__R"),
      coalesce(sum(col("__s").cast(dec) * col("__n").cast(dec)),
        lit(0L).cast(dec)).as("__s1"),
      coalesce(sum(col("__s").cast(dec) * col("__s").cast(dec) *
        col("__n").cast(dec)), lit(0L).cast(dec)).as("__s2"),
      coalesce(sum(col("__s").cast(dec) * col("__r").cast(dec)),
        lit(0L).cast(dec)).as("__t1"))
    val radicand = col("__R") * (col("__N") - col("__R")) *
      (col("__N") * col("__s2") - col("__s1") * col("__s1"))
    g.select(
      col("__N").cast("long").as("n"), col("k"),
      col("__R").cast("long").as("n_success"),
      when(col("k") < 2, raise_error(lit(
        "Drift.cochranArmitage: need at least 2 strata present")))
        .when(col("__R") === 0 || col("__R") === col("__N"),
          raise_error(lit(
            "Drift.cochranArmitage: all-success or all-failure — " +
              "the trend variance is 0 and z is 0/0")))
        .otherwise(
          (col("__N") * col("__t1") - col("__R") * col("__s1"))
            .cast("double") * sqrt(col("__N").cast("double")) /
            sqrt(radicand.cast("double")))
        .as("z"))
  }

  /** Page's trend test (Page 1963) — the ORDERED-alternative member
    * of the repeated-measures family ([[friedman]] asks "did ANY
    * treatment shift within blocks"; this asks "do the treatments
    * rise in the GIVEN order within blocks" — quality across ordered
    * pipeline revisions measured on the same cohorts):
    * `L = Σ_j s_j R_j` over within-block mid-ranks R_j with scores
    * s_j = 1..k in the hypothesized order, z-scored with the no-tie
    * null moments `E[L] = b·k(k+1)²/4`,
    * `Var[L] = b·k²(k+1)²(k−1)/144` (the standard normal
    * approximation; mid-ranks keep L exact under ties while the
    * variance stays the untied form — documented convention).
    *
    * Distributed shape: the [[friedman]] doubled mid-rank recipe
    * (distinct-cell collapse, per-block k-array, k² in-array
    * comparisons), then one broadcast score join and one global
    * aggregate — 2L and every moment are exact integers, z one fixed
    * raw IEEE chain.
    *
    * Loud degenerates: a treatment outside `treatmentOrder`, fewer
    * than 2 treatments, zero complete blocks.
    *
    * @param treatmentOrder hypothesized ascending order; must cover
    *                       every treatment present in a kept block
    * @return one row: (n_blocks, k, l, z) — l in ½ steps */
  def pageTrend(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String, treatmentOrder: Seq[String]): DataFrame = {
    val k = treatmentOrder.size
    require(k >= 2 && k <= 64,
      s"pageTrend: treatmentOrder size must be in [2, 64]: $k")
    require(treatmentOrder.distinct.size == k,
      "pageTrend: duplicate treatment in treatmentOrder")
    val spark = df.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val exploded = blockRanks(df, blockCol, treatmentCol, valueCol, k,
      "pageTrend")
    val tidx = spark.createDataFrame(
      treatmentOrder.zipWithIndex.map { case (t, i) => (t, i + 1L) })
      .toDF("__ot", "__s")
    val scored = exploded.join(broadcast(tidx),
        col("__t") <=> col("__ot"), "left")
      .select(col("__r2"),
        when(col("__s").isNull, raise_error(concat(lit(
          "Drift.pageTrend: treatment not in treatmentOrder: "),
          col("__t"))))
          .otherwise(col("__s")).as("__s"))
    val g = scored.agg(
      (count(lit(1)) / k).as("__b"),
      coalesce(sum(col("__s").cast(dec) * col("__r2").cast(dec)),
        lit(0L).cast(dec)).as("__l2"))
    val b = col("__b").cast(dec)
    val kD = lit(k.toLong).cast(dec)
    // E[2L] = b·k(k+1)²/2 is always integral (k or (k+1)² is even);
    // Var[2L] = b·k²(k+1)²(k−1)/36 is NOT (k=4: …/36 = 33.3̄), so the
    // /36 happens in DOUBLE on the exact integer numerator — decimal
    // division would silently round to the decimal scale
    val e2 = b * kD * (kD + 1) * (kD + 1) / 2
    val var2Num = b * kD * kD * (kD + 1) * (kD + 1) * (kD - 1)
    g.select(col("__b").cast("long").as("n_blocks"),
      lit(k.toLong).as("k"),
      (col("__l2").cast("double") / 2.0).as("l"),
      when(col("__b") === 0, raise_error(lit(
        "Drift.pageTrend: no complete blocks — every block needs " +
          "exactly one cell per ordered treatment")))
        .otherwise((col("__l2") - e2).cast("double") /
          sqrt(var2Num.cast("double") / 36.0))
        .as("z"))
  }

  /** Kendall's coefficient of concordance W — the EFFECT SIZE of the
    * repeated-measures family ([[friedman]] answers "is there any
    * shift" with a test statistic; W answers "HOW MUCH do the blocks
    * agree on the treatment ordering", 0 = no agreement, 1 = identical
    * rankings in every block; χ²_F = b(k−1)·W ties the two — asserted
    * as a differential spec): tie-corrected
    * `W = 12·Σ_j(R_j − b(k+1)/2)² / (b²k(k²−1) − b·Σ(t³−t))`.
    *
    * Same [[blockRanks]] recipe; with doubled mid-ranks the numerator
    * is `3·Σ_j(R2_j − b(k+1))²` and every term is an exact integer —
    * W is ONE raw division of exact DECIMAL sums.
    *
    * Loud degenerates: zero complete blocks; every block fully tied
    * (the corrected denominator is 0 — agreement is undefined when no
    * block expresses a preference).
    *
    * @return one row: (n_blocks, k, w) */
  def kendallW(df: DataFrame, blockCol: String, treatmentCol: String,
      valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kendallW: need k >= 2 treatments, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val exploded = blockRanks(df, blockCol, treatmentCol, valueCol, k,
      "kendallW")
    val perT = exploded.groupBy(col("__t"))
      .agg(count(lit(1)).as("__nb"),
        sum(col("__r2").cast(dec)).as("__r2s"))
    val tie = exploded.agg(coalesce(
      sum(col("__eq").cast(dec) * col("__eq").cast(dec) - 1),
      lit(0L).cast(dec)).as("__tie"))
    // b = max(__nb) assumes every kept block carries the SAME k
    // treatment labels — blocks of k cells drawn from DIFFERENT label
    // sets (block1 = {A,B,C,D}, block2 = {B,C,D,E}) pass blockRanks'
    // per-block filter but make the per-treatment counts unequal and W
    // silently invalid; require the treatment-set agreement friedman
    // already enforces (== k total labels, which with k distinct per
    // block forces every treatment into every block) plus the
    // explicit equal-count assert
    val g = perT.agg(max("__nb").as("__b"), min("__nb").as("__bmin"),
        count(lit(1)).as("__kt"),
        coalesce(sum(
          (col("__r2s") - col("__nb").cast(dec) * (k + 1)) *
            (col("__r2s") - col("__nb").cast(dec) * (k + 1))),
          lit(0L).cast(dec)).as("__s3x4"))
      .crossJoin(tie)
    val b = col("__b").cast(dec)
    val den = b * b * k * (lit(k.toLong * k - 1).cast(dec)) -
      b * col("__tie")
    g.select(col("__b").cast("long").as("n_blocks"), lit(k.toLong).as("k"),
      when(col("__b").isNull || col("__b") === 0, raise_error(lit(
        "Drift.kendallW: no complete blocks")))
        .when(col("__kt") =!= k || col("__bmin") =!= col("__b"),
          raise_error(lit(
            "Drift.kendallW: blocks disagree on the treatment set — " +
              "every treatment must appear in every kept block")))
        .when(den === 0, raise_error(lit(
          "Drift.kendallW: every block fully tied — no block " +
            "expresses a preference, W is 0/0")))
        .otherwise(lit(3L).cast(dec).cast("double") *
          col("__s3x4").cast("double") / den.cast("double"))
        .as("w"))
  }
}
