package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group robust outlier detection via median / MAD (median absolute
  * deviation) — the length-outlier filter of corpus curation: mean/stddev
  * break down under the heavy-tailed length distributions web corpora
  * have (a handful of megabyte documents drag the mean past most of the
  * corpus), while the median/MAD pair has a 50% breakdown point
  * (Leys et al. 2013; the Gopher length filters use fixed thresholds —
  * MAD makes them distribution-relative per group).
  *
  * `x` is an outlier in its group iff `|x - median| > k * MAD`. With the
  * conventional consistency constant folded into `k` (k=3 here ≈ 2σ for
  * normal data at k·1.4826).
  *
  * Scale shape: two exact-percentile aggregations (Spark's `percentile`
  * does partial aggregation; the shuffle carries group keys + counters),
  * each group's one-row stats broadcast-joined back onto the rows —
  * the rows themselves never re-shuffle. Groups = languages/sources
  * (small cardinality); rows = corpus scale.
  *
  * Determinism note (gate discipline, NOTES.md rounding taxonomy): with
  * integer-valued `x`, medians and MADs are quarter-integers — exact in
  * binary — so `> k*MAD` never sits on an FP boundary and the flag
  * hash-matches any IEEE engine. MAD = 0 (over half the group identical)
  * flags every non-median value; that is the standard MAD caveat, kept.
  */
object Outliers {

  /** Broadcast equi-join on `keys` with NULL-SAFE equality (`<=>`) and
    * left semantics: rows whose group key is NULL still match their own
    * (null-keyed) stats row, and rows with no stats row at all pass
    * through with null stats instead of vanishing. Plain `join(df, keys)`
    * silently DROPS every null-keyed row — the exact contract violation
    * for operators documented as "adds a column to every row". */
  private def statsJoin(rows: DataFrame, stats: DataFrame,
      keys: Seq[String]): DataFrame = {
    // stats derives from rows, so `rows(k) <=> stats(k)` resolves both
    // sides to the SAME attribute (Spark logs "trivially true equals
    // predicate" and self-join disambiguation has to guess); renaming
    // the stats keys makes the join condition unambiguous by name
    val renamed = keys.foldLeft(stats) { (d, k) =>
      d.withColumnRenamed(k, s"__sj_$k")
    }
    val cond = keys.map(k => rows(k) <=> renamed(s"__sj_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    keys.foldLeft(rows.join(broadcast(renamed), cond, "left")) {
      (d, k) => d.drop(s"__sj_$k")
    }
  }

  /** Adds `__med`, `__mad`, `is_outlier` to every row. */
  def madFlag(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 3.0): DataFrame = {
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")
    val med = df.groupBy(g: _*)
      .agg(percentile(v, lit(0.5)).as("__med"))
    val dev = statsJoin(df, med, groupCols)
      .withColumn("__dev", abs(v - col("__med")))
    val mad = dev.groupBy(g: _*)
      .agg(percentile(col("__dev"), lit(0.5)).as("__mad"))
    statsJoin(dev, mad, groupCols)
      .withColumn("is_outlier", col("__dev") > lit(k) * col("__mad"))
  }

  /** Per-group outlier summary: n, n_outliers, median, mad. */
  def madSummary(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 3.0): DataFrame =
    madFlag(df, groupCols, valueCol, k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
        first(col("__med")).as("median"),
        first(col("__mad")).as("mad"))

  /** Per-group winsorization at exact DISCRETE quantiles: values clip to
    * `[Q_disc(lo), Q_disc(hi)]` where `Q_disc(q)` is the smallest group
    * element whose cumulative fraction reaches q (the SQL-standard
    * `percentile_disc`, an actual element — no interpolation, so the
    * bound is exact in any engine and winsorized INTEGER features stay
    * integers). The standard heavy-tail taming for length/count features
    * where trimming (dropping) would bias the mixture.
    *
    * Shape: one per-group window rank pass picks the two bound elements
    * (rows ≤ 2 per group survive the filter), broadcast back; the clip
    * itself is map-only. Groups = languages/sources; rows = corpus.
    *
    * Adds `winsorized` (+ `__lo`, `__hi`) to every row. */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, s"bad bounds [$lo, $hi]")
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v"))
    // percentile-family semantics: NULL values neither rank nor count
    // toward the quantile positions (unfiltered, NULLs sort first and
    // shift every bound; a bound landing ON a null row would even null
    // the clip silently)
    val ranked = df.select((g :+ col(valueCol).as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
    // percentile_disc rank: smallest element with cum fraction >= q,
    // i.e. 1-based rank ceil(q*n) (>= 1), computed exactly in decimal
    // ([[Selection.discRank]] — no FP nudge, valid at any n)
    def qRank(q: Double) = Selection.discRank(q, col("__n"))
    val bounds = ranked
      .filter(col("__rn") === qRank(lo) || col("__rn") === qRank(hi))
      .groupBy(g: _*)
      .agg(min(when(col("__rn") === qRank(lo), col("__v"))).as("__lo"),
        max(when(col("__rn") === qRank(hi), col("__v"))).as("__hi"))
    statsJoin(df, bounds, groupCols)
      // NULL values stay NULL (greatest/least skip nulls, which would
      // otherwise silently clip a NULL up to the lower bound); a group
      // with no bounds row (all values NULL) passes through unclipped
      .withColumn("winsorized",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(
            greatest(col(valueCol), coalesce(col("__lo"), col(valueCol))),
            coalesce(col("__hi"), col(valueCol)))))
  }

  /** Robust per-group standardization — `(x − median) / IQR`: the
    * scaler feature prep reaches for when [[madFlag]] says the tails
    * are heavy (mean/stddev scaling lets one outlier set every other
    * row's scale). Quartiles come from
    * [[Selection.groupedQuantiles]] — the distinct-value collapse +
    * two-phase cumulative, NOT a per-group row window: a 100 TB corpus
    * with five language groups would hand a row_number window five
    * giant sort partitions, while the collapse's windows ride the
    * (group, bucket) grid. percentile_disc semantics keep integer
    * features integer, so the transform is one IEEE division of exact
    * integers per row — RAW-gateable.
    *
    * NULL values stay NULL; a zero-IQR group (over half the group
    * tied) yields NULL `scaled` for its rows (the sweep-row
    * discipline — flagging beats failing a whole pipeline over one
    * degenerate segment; filter on `scaled IS NULL` to find them).
    *
    * @param bucket the rank-phase bucket fn (monotone in the value —
    *               the groupedQuantiles contract)
    * @return the input columns + `scaled` */
  def robustScale(df: DataFrame, groupCols: Seq[String],
      valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val qdf = Selection.groupedQuantiles(df, groupCols, valueCol,
      Seq(0.25, 0.5, 0.75), bucket)
    val stats = qdf.groupBy(groupCols.map(col): _*)
      .agg(min(when(col("q") === 0.25, col("value"))).as("__q1"),
        min(when(col("q") === 0.5, col("value"))).as("__med"),
        min(when(col("q") === 0.75, col("value"))).as("__q3"))
    statsJoin(df, stats, groupCols)
      .withColumn("scaled",
        when(col(valueCol).isNull ||
            col("__q3").isNull || (col("__q3") === col("__q1")),
          lit(null).cast("double"))
          .otherwise(
            (col(valueCol).cast("double") - col("__med").cast("double"))
              / (col("__q3").cast("double") - col("__q1").cast("double"))))
      .drop("__q1", "__med", "__q3")
  }

  /** Exact symmetric trimmed mean — [[winsorize]]'s DROP counterpart
    * (clip keeps outlier rows at the boundary value; trim removes
    * them): drop `⌊trim·n⌋` rows from EACH tail by rank and average
    * the rest. No global sort — rides
    * [[Concentration.rankBlocks]] (distinct-cents collapse + two-phase
    * cumulative), with the boundary blocks split EXACTLY by rank
    * arithmetic: a block of `m` copies after `cumBefore` rows keeps
    * `min(cumBefore+m, n−k) − max(cumBefore, k)` of them (clamped at
    * 0). `⌊trim·n⌋` is decimal-exact (the discRank contract); the kept
    * sum is DECIMAL(38,0) cents; the mean is ONE IEEE division,
    * shipped raw.
    *
    * @param trim fraction to drop per side, in [0, 0.5); raises when
    *             nothing survives (n − 2k ≤ 0)
    * @return one row: (n, n_kept, trimmed_mean) — mean in dollars */
  def trimmedMean(df: DataFrame, valueCol: String, trim: Double,
      bucket: Column => Column): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trim must be in [0, 0.5): $trim")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cum = Concentration.rankBlocks(df, valueCol, bucket)
    val tot = cum.agg(coalesce(sum("__m"), lit(0L)).as("__nr"))
    val k = floor(lit(new java.math.BigDecimal(trim.toString)) *
      col("__nr")).cast("long")
    val guarded = tot.select(
      when(col("__nr") === 0, raise_error(lit(
        "Outliers.trimmedMean: no non-null values")))
        .otherwise(col("__nr")).as("n"),
      k.as("__k"))
    // kept-count/kept-sum as a global aggregate (1 row even on empty
    // input), anchored on the guarded totals — the Drift.ks shape
    val kept = cum.crossJoin(broadcast(guarded))
      .withColumn("__keepM",
        greatest(lit(0L),
          least(col("__cumBefore") + col("__m"), col("n") - col("__k")) -
            greatest(col("__cumBefore"), col("__k"))))
      .groupBy()
      .agg(coalesce(sum("__keepM"), lit(0L)).as("__keptN"),
        coalesce(sum(col("__v").cast(dec) * col("__keepM").cast(dec)),
          lit(0L).cast(dec)).as("__keptSum"))
    guarded.crossJoin(kept)
      .select(col("n"),
        when(col("__keptN") === 0, raise_error(lit(
          "Outliers.trimmedMean: trim leaves no rows (n - 2k <= 0)")))
          .otherwise(col("__keptN")).as("n_kept"),
        when(col("__keptN") === 0, raise_error(lit(
          "Outliers.trimmedMean: trim leaves no rows (n - 2k <= 0)")))
          .otherwise(col("__keptSum").cast("double") /
            (lit(100.0) * col("__keptN"))).as("trimmed_mean"))
  }
}
