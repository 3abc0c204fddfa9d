package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rank correlation at corpus scale — Spearman's ρ and Kendall's
  * τ-b, the monotonic-association companions to [[Features.corrMatrix]]
  * (Pearson measures LINEAR association; a quality score can rank a
  * corpus perfectly while correlating poorly in value). The curation
  * questions these answer: "does the model-based quality score agree
  * with the heuristic one?", "does doc length rank-predict dedup
  * survival?" — answered exactly, with ties handled the standard way
  * (average ranks for ρ, the τ-b tie correction for τ).
  *
  * FP discipline (the [[Drift.mannWhitney]] recipe): ranks are exact
  * INTEGERS (doubled average ranks, so ties at .5 stay integral), every
  * moment is an exact DECIMAL(38,0) sum over the distinct-value
  * collapse, and the statistic is one fixed IEEE chain over those
  * exact integers, shipped rounded 9dp.
  *
  * Scale shape: both statistics collapse rows to DISTINCT-value tables
  * first (one groupBy shuffle — the cardinality class of the data, not
  * its size). ρ ranks each axis with the two-phase bucket-offset
  * running count (offsets window over per-BUCKET totals, marked
  * [[Bounded.constPart]]; in-bucket windows bounded by bucket grain —
  * no global sort), then joins the two rank tables back to the cell
  * table by value. τ-b pairs distinct CELLS — |cells|² pair space, the
  * [[Eval.confusionStats]] cardinality contract — so it requires
  * bucketed/ordinal inputs and raises loudly past `maxCells` instead
  * of silently planning a corpus-scale cartesian.
  */
object RankCorr {

  private val Dec = org.apache.spark.sql.types.DecimalType(38, 0)

  /** Doubled average rank per distinct value: (value, m, r2) where
    * r2 = 2·|{rows strictly below}| + m + 1 — exactly 2× the average
    * rank of the m copies. Two-phase: per-bucket totals feed the
    * offsets window (one row per bucket), in-bucket cums are
    * bucket-bounded. */
  private def rank2Table(marg: DataFrame, vName: String, mName: String,
      bucket: Column => Column, outV: String, outR: String): DataFrame = {
    val withBk = marg.withColumn("__bk", bucket(col(vName)))
    val wOff = Window.partitionBy(Bounded.constPart(col("__t")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withBk.groupBy(col("__bk"))
      .agg(sum(mName).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__off"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col(vName))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withBk.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__below",
        col("__off") + sum(col(mName)).over(wIn) - col(mName))
      .select(col(vName).as(outV),
        (lit(2L) * col("__below") + col(mName) + lit(1L)).as(outR))
  }

  /** Spearman's ρ with average-rank ties: Pearson correlation of the
    * exact (doubled) ranks. NULL in either column drops the row.
    *
    * @param bucketX/@param bucketY monotone non-decreasing coarsenings
    *        of each axis (the [[Selection.exactQuantiles]] bucket
    *        contract) — bucket skew bounds per-task window size
    * @return one row: (n, rho) */
  def spearmanRho(df: DataFrame, xCol: String, yCol: String,
      bucketX: Column => Column, bucketY: Column => Column): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    val cells = base.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__m"))
    val xr = rank2Table(cells.groupBy(col("__x").as("__xv"))
      .agg(sum("__m").as("__mx")), "__xv", "__mx", bucketX,
      "__xj", "__r2x")
    val yr = rank2Table(cells.groupBy(col("__y").as("__yv"))
      .agg(sum("__m").as("__my")), "__yv", "__my", bucketY,
      "__yj", "__r2y")
    val joined = cells
      .join(xr, col("__x") <=> col("__xj"))
      .join(yr, col("__y") <=> col("__yj"))
    val m = col("__m").cast(Dec)
    val rx = col("__r2x").cast(Dec)
    val ry = col("__r2y").cast(Dec)
    val agg = joined.agg(
      coalesce(sum(col("__m")), lit(0L)).as("n"),
      coalesce(sum(m * rx), lit(0L).cast(Dec)).as("__sx"),
      coalesce(sum(m * ry), lit(0L).cast(Dec)).as("__sy"),
      coalesce(sum(m * rx * rx), lit(0L).cast(Dec)).as("__sxx"),
      coalesce(sum(m * ry * ry), lit(0L).cast(Dec)).as("__syy"),
      coalesce(sum(m * rx * ry), lit(0L).cast(Dec)).as("__sxy"))
    val nD = col("n").cast(Dec)
    val guarded = agg.select(
      when(col("n") < 2, raise_error(lit(
        "RankCorr.spearmanRho: need n >= 2 jointly non-null rows")))
        // 4n^4 must stay inside DECIMAL(38,0) for the exact moments
        .when(col("n") > 2000000000L, raise_error(lit(
          "RankCorr.spearmanRho: n beyond 2e9 — the exact decimal " +
            "moments overflow; shard and merge")))
        .otherwise(col("n")).as("n"),
      (nD * col("__sxx") - col("__sx") * col("__sx")).as("__dx"),
      (nD * col("__syy") - col("__sy") * col("__sy")).as("__dy"),
      (nD * col("__sxy") - col("__sx") * col("__sy")).as("__num"))
    guarded.select(col("n"),
      when(col("__dx") === 0 || col("__dy") === 0, raise_error(lit(
        "RankCorr.spearmanRho: constant sample on one axis — rho " +
          "undefined")))
        .otherwise(round(col("__num").cast("double") /
          (sqrt(col("__dx").cast("double")) *
            sqrt(col("__dy").cast("double"))), 9))
        .as("rho"))
  }

  /** Kendall's τ-b (tie-corrected):
    * `τ_b = (C − D) / sqrt((n0 − n1)(n0 − n2))` with C/D the exact
    * concordant/discordant pair counts, n0 = n(n−1)/2, and n1/n2 the
    * within-tie pair counts of each axis — all exact integers off the
    * distinct-cell table, so the output is one IEEE chain (9dp).
    *
    * The pair space is |cells|² (BUCKETED/ordinal inputs — quality
    * bands, grades, small integer measures); the `maxCells` guard
    * raises in-plan rather than let a near-continuous column plan a
    * corpus-sized cartesian. The cell side of the pair join broadcasts
    * (bounded by the same guard).
    *
    * @return one row: (n, concordant, discordant, tau) */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String,
      maxCells: Int = 4096): DataFrame = {
    require(maxCells >= 1, s"maxCells must be >= 1: $maxCells")
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).as("__x"), col(yCol).as("__y"))
    val cells = base.groupBy(col("__x"), col("__y"))
      .agg(count(lit(1)).as("__m"))
    // the guard rides the BROADCAST side's referenced count column (a
    // raise on an unreferenced crossJoined column gets column-pruned
    // away): it fires while the broadcast is BUILT — before the driver
    // could materialize an oversized cell table, and before any pair
    val guard = cells.agg(count(lit(1)).as("__nc"))
    val l = cells.select(col("__x").as("__x1"), col("__y").as("__y1"),
      col("__m").as("__m1"))
    val r = cells.crossJoin(guard)
      .select(col("__x").as("__x2"), col("__y").as("__y2"),
        when(col("__nc") > maxCells, raise_error(concat(
          lit(s"RankCorr.kendallTauB: distinct (x, y) cells exceed " +
            s"$maxCells — bucket the inputs (cells="),
          col("__nc").cast("string"), lit(")"))))
          .otherwise(col("__m")).as("__m2"))
    // each unordered cell pair once, via the lexicographic struct order
    val pairs = l.join(broadcast(r),
      struct(col("__x1"), col("__y1")) < struct(col("__x2"), col("__y2")))
    val mm = col("__m1").cast(Dec) * col("__m2").cast(Dec)
    val conc = (col("__x1") < col("__x2") && col("__y1") < col("__y2")) ||
      (col("__x1") > col("__x2") && col("__y1") > col("__y2"))
    val disc = (col("__x1") < col("__x2") && col("__y1") > col("__y2")) ||
      (col("__x1") > col("__x2") && col("__y1") < col("__y2"))
    val cd = pairs.agg(
      coalesce(sum(when(conc, mm).otherwise(lit(0).cast(Dec))),
        lit(0).cast(Dec)).as("__c"),
      coalesce(sum(when(disc, mm).otherwise(lit(0).cast(Dec))),
        lit(0).cast(Dec)).as("__d"))
    // doubled tie-pair counts per axis: Σ t·(t−1) — off the marginals
    def tiePairs2(vName: String, tag: String) = cells
      .groupBy(col(vName)).agg(sum("__m").as("__t"))
      .agg(coalesce(sum(col("__t").cast(Dec) * (col("__t") - 1).cast(Dec)),
        lit(0).cast(Dec)).as(s"__t$tag"))
    val nRow = cells.agg(coalesce(sum("__m"), lit(0L)).as("n"))
    val joinedStats = nRow.crossJoin(cd)
      .crossJoin(tiePairs2("__x", "x")).crossJoin(tiePairs2("__y", "y"))
    val n02 = col("n").cast(Dec) * (col("n") - 1).cast(Dec) // 2·n0
    val d1 = n02 - col("__tx") // 2·(n0 − n1)
    val d2 = n02 - col("__ty") // 2·(n0 − n2)
    joinedStats.select(
      when(col("n") < 2, raise_error(lit(
        "RankCorr.kendallTauB: need n >= 2 jointly non-null rows")))
        .otherwise(col("n")).as("n"),
      col("__c").cast("long").as("concordant"),
      col("__d").cast("long").as("discordant"),
      when(d1 === 0 || d2 === 0, raise_error(lit(
        "RankCorr.kendallTauB: all values tied on one axis — tau " +
          "undefined")))
        // τ = (C−D)/sqrt((d1/2)(d2/2)) = 2(C−D)/sqrt(d1·d2)
        .otherwise(round(lit(2.0) *
          (col("__c") - col("__d")).cast("double") /
          (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))), 9))
        .as("tau"))
  }
}
