package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-sum linear statistics: per-group simple (one-feature) linear
  * regression and correlation from closed-form moment sums — the quick
  * diagnostic fit every curation pipeline runs (does quality score
  * predict loss? does length predict toxicity?) at any scale, because it
  * is ONE partial-aggregatable pass: each task reduces to six moment
  * sums per group, the shuffle carries (group, 6 numbers), and the
  * closed form runs on the reduced row.
  *
  * Numeric discipline (the repo's cross-engine gate rules): the MOMENT
  * SUMS are computed in fixed-scale decimal, so they are exact integers
  * regardless of partitioning/summation order; only the final closed
  * form — a fixed tree of two-operand IEEE multiply/subtract/divide on
  * the decimal-cast doubles — runs in floating point, and every engine
  * evaluating that same tree on the same exact sums produces the same
  * bits. A naive `sum(double)` formulation is summation-order-sensitive
  * and cannot hash-gate (the r4 `q_bucketed_join` lesson).
  */
object Regression {

  /** Per-group OLS fit of y = slope·x + intercept, plus r².
    *
    * Inputs are cast to `decimal(18,2)` (exact for 2-dp money/quantity
    * data); products take scale 4, still exact. Output columns: group
    * cols, n, slope, intercept, r2 — the three doubles ship RAW (each is
    * a deterministic IEEE expression over exact sums; rounding would
    * only add half-point fragility).
    */
  def linearFit(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val sums = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
    // one fixed double-arithmetic tree; cov/vx/vy each a single
    // subtraction of two products of decimal-cast doubles
    val d = (c: String) => col(c).cast("double")
    val withMoments = sums.select(
      groupCols.map(col) :+ col("n") :+
        (d("n") * d("sxy") - d("sx") * d("sy")).as("cov") :+
        (d("n") * d("sxx") - d("sx") * d("sx")).as("vx") :+
        (d("n") * d("syy") - d("sy") * d("sy")).as("vy") :+
        d("sx").as("sxd") :+ d("sy").as("syd"): _*)
    withMoments.select(
      groupCols.map(col) :+ col("n") :+
        (col("cov") / col("vx")).as("slope") :+
        ((col("syd") - col("cov") / col("vx") * col("sxd")) / d("n"))
          .as("intercept") :+
        (col("cov") * col("cov") / (col("vx") * col("vy"))).as("r2"): _*)
  }
}
