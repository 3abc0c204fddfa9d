package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality statistics over a value column — the
  * Gini coefficient and top-share cuts (Lorenz-curve points): the
  * standard "how skewed is this distribution" audit for revenue
  * concentration, domain token share in a training corpus, or per-key
  * event load (the skew REPORT that precedes a [[SkewJoin]] decision).
  *
  * Distributed shape — NO global sort of rows: collapse to the
  * distinct-value count table (one shuffle, the [[Drift.ks]]
  * discipline), then the two-phase bucket-offset running count gives
  * each distinct value its exact ascending rank block; a value `v`
  * repeated `m` times starting after `cumBefore` rows contributes
  * `v·m·(2·cumBefore + m − n)` to the rank-weighted Gini numerator —
  * the within-block rank sum in closed form, so ranks are never
  * materialized per row.
  *
  * Exactness: values are 2-dp money scaled to integer cents (guarded);
  * numerator and denominator are exact DECIMAL(38,0) sums of long
  * products; `gini = num / (n·Σv)` is ONE IEEE division of exact
  * integers, shipped raw (the hash-gate rule). Negative values raise
  * loudly (the Lorenz construction assumes a non-negative measure).
  */
object Concentration {

  /** Gini coefficient `G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx)` (ascending
    * order statistics; 0 = uniform, →1 = all mass on one row).
    *
    * @param bucket monotone coarsening of the value order bounding
    *               per-task window size ([[Selection.exactQuantiles]])
    * @return one row: (n, total, gini) — total in dollars (exact
    *         decimal cast back to double) */
  def gini(df: DataFrame, valueCol: String,
      bucket: Column => Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cum = rankBlocks(df, valueCol, bucket)
    val tot = cum.agg(coalesce(sum("__m"), lit(0L)).as("__nr"),
      coalesce(sum(col("__v").cast(dec) * col("__m").cast(dec)),
        lit(0L).cast(dec)).as("__svr"))
    val guarded = tot.select(
      when(col("__nr") === 0 || col("__svr") === 0, raise_error(lit(
        "Concentration.gini: needs rows with positive total mass")))
        .otherwise(col("__nr")).as("n"), col("__svr").as("__sv"))
    // the numerator is its own GLOBAL aggregate (1 row even on empty
    // input), and the final select anchors on the guarded totals —
    // the Drift.ks shape, so AQE's empty-relation propagation cannot
    // prune the guard away with an empty crossJoin side
    val num = cum.crossJoin(broadcast(tot))
      .groupBy()
      .agg(coalesce(sum(col("__v").cast(dec) * col("__m").cast(dec) *
        (lit(2L) * col("__cumBefore") + col("__m") - col("__nr"))
          .cast(dec)), lit(0L).cast(dec)).as("__num"))
    guarded.crossJoin(num)
      .select(col("n"),
        (col("__sv").cast("double") / 100.0).as("total"),
        // belt on top of the n-guard: expression evaluation order
        // within a projection is not contractual, so the division
        // carries its own lazy raise (ANSI div-by-zero otherwise)
        when(col("__sv") === 0, raise_error(lit(
          "Concentration.gini: needs rows with positive total mass")))
          .otherwise(col("__num").cast("double") /
            (col("n").cast(dec) * col("__sv")).cast("double"))
          .as("gini"))
  }

  /** Lorenz top-share points: the fraction of total mass held by the
    * top `p` share of rows, for each requested `p` (e.g. Seq(0.01,
    * 0.1, 0.5) → "top 1% holds X% of revenue"). Row cuts use the
    * [[Selection.discRank]] ceiling (top-p rows = the n − ⌈(1−p)·n⌉
    * highest… expressed against the ascending cumulative as rows with
    * rank > ⌈(1−p)·n⌉); the boundary value's block is split exactly —
    * integer arithmetic end-to-end, share = one IEEE division.
    *
    * @return one row per p: (p, cut_rows, share) */
  def topShare(df: DataFrame, valueCol: String, ps: Seq[Double],
      bucket: Column => Column): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1),
      "Concentration.topShare: each p must sit in (0, 1)")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cum = rankBlocks(df, valueCol, bucket)
    val tot = cum.agg(coalesce(sum("__m"), lit(0L)).as("__nr"),
      coalesce(sum(col("__v").cast(dec) * col("__m").cast(dec)),
        lit(0L).cast(dec)).as("__svr"))
    val guarded = tot.select(
      when(col("__nr") === 0 || col("__svr") === 0, raise_error(lit(
        "Concentration.topShare: needs rows with positive total mass")))
        .otherwise(col("__nr")).as("n"), col("__svr").as("__sv"))
    // (1−p) as an exact decimal via its shortest decimal string — the
    // Selection.discRank contract, shipped per-row since p varies
    val spark = df.sparkSession
    import spark.implicits._
    val pRows = ps.map(p =>
      (p, scala.math.BigDecimal((1.0 - p).toString))).toDF("p", "__q")
    // per-p top sums as their own aggregate over the (possibly empty)
    // cum table; the final select anchors on the guarded totals via a
    // left join from the ALWAYS-populated guarded×pRows side — the
    // Drift.ks shape (AQE empty-relation propagation cannot prune the
    // guard with an empty aggregate side)
    val tops = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(pRows))
      // rows strictly above the cut rank belong to the top-p set; the
      // block containing the cut contributes only its tail
      .withColumn("__cut",
        col("__nr") - greatest(lit(1L),
          ceil(col("__q") * col("__nr")).cast("long")))
      .withColumn("__takeM",
        greatest(lit(0L),
          least(col("__m"),
            col("__cumBefore") + col("__m") -
              (col("__nr") - col("__cut")))))
      .groupBy(col("p").as("__p2"))
      .agg(max("__cut").as("cut_rows"),
        coalesce(sum(col("__v").cast(dec) * col("__takeM").cast(dec)),
          lit(0L).cast(dec)).as("__top"))
    guarded.crossJoin(broadcast(pRows))
      .join(tops, col("p") <=> col("__p2"), "left")
      // the raise rides the OUTPUT expression (a guard on a dropped
      // column is erased by column pruning — found live: ANSI
      // DIVIDE_BY_ZERO surfaced instead of the loud message)
      .select(col("p"),
        when(col("__sv") === 0, raise_error(lit(
          "Concentration.topShare: needs rows with positive total mass")))
          .otherwise(col("cut_rows")).as("cut_rows"),
        when(col("__sv") === 0, raise_error(lit(
          "Concentration.topShare: needs rows with positive total mass")))
          .otherwise(col("__top").cast("double") /
            col("__sv").cast("double")).as("share"))
  }

  /** Distinct-cents count table with exact strictly-below cumulative
    * row counts (ascending value order) — the shared two-phase scheme.
    * Columns: (__v cents, __m count, __cumBefore). Shared with
    * [[Outliers.trimmedMean]]. */
  private[operators] def rankBlocks(df: DataFrame, valueCol: String,
      bucket: Column => Column): DataFrame = {
    val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cents = when(cents0.isNull && col(valueCol).isNotNull,
        raise_error(lit("Concentration: value overflows long cents")))
      .when(cents0 < 0, raise_error(lit(
        "Concentration: negative values break the Lorenz construction")))
      .otherwise(cents0)
    val g = df.filter(col(valueCol).isNotNull)
      .select(cents.as("__v"))
      .groupBy("__v").agg(count(lit(1)).as("__m"))
      .withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tm")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = g.groupBy("__bk").agg(sum("__m").as("__tm"))
      .withColumn("__om", coalesce(sum(col("__tm")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__om"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__cumBefore",
        col("__om") + coalesce(sum(col("__m")).over(wIn), lit(0L)))
      .select(col("__v"), col("__m"), col("__bk"), col("__cumBefore"))
  }
}
