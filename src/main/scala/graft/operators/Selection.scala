package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL order statistics without a global sort — the
  * distributed-selection answer to "the exact median of 100 TB":
  * `row_number() OVER (ORDER BY v)` plans a one-task sort (the
  * scale-killer), and sketches (LogHist, approx_percentile) trade
  * exactness away. Selection needs neither: collapse to per-DISTINCT-
  * value counts, run the bucketed two-phase running count (the
  * [[Sequence.assignGlobalSeq]] / [[Drift.ks]] discipline — the only
  * unpartitioned window runs over bucket COUNTS, one row per bucket),
  * and each quantile's answer is the smallest value whose cumulative
  * count reaches its rank.
  *
  * Semantics are `percentile_disc` (DuckDB `quantile_disc`): the
  * element at 1-based rank `⌈q·n⌉` (min 1), computed in DECIMAL so the
  * product is exact at every magnitude (an absolute FP nudge like
  * `ceil(q·n − 1e-9)` silently stops working once q·n exceeds ~2^23,
  * where 1e-9 falls below one ulp — exactly the billions-scale n the
  * operator advertises). NULLs neither rank nor count. Values return
  * VERBATIM — discrete selection has no interpolation FP, so results
  * hash exactly.
  */
object Selection {

  /** 1-based `percentile_disc` rank `max(1, ⌈q·n⌉)` computed EXACTLY:
    * `q` enters as a decimal literal (via its shortest decimal string,
    * so 0.05 is 5/100 — not the nearest double) and multiplies the
    * long count in decimal arithmetic, which Spark keeps exact to 38
    * digits. No epsilon, valid at any n. */
  /** Shared per-group distinct-value cumulative table of
    * [[groupedQuantiles]] and [[conformalQuantile]]: the two-phase
    * bucket-offset running count, grouped. Returns (cum, nRow). */
  private def groupedCum(df: DataFrame, groupCols: Seq[String],
      valueCol: String, bucket: Column => Column)
      : (DataFrame, DataFrame) = {
    val g = groupCols.map(col)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(g :+ col(valueCol).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__bk", bucket(col("__v")))
    val wOff = Window.partitionBy(g: _*).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // derived sides RENAME their keys before rejoining the parent —
    // grouped outputs keep the parent's attribute ids, and a join on
    // the same id is the trivially-true-predicate trap (the r9
    // ngramJaccard WARN class)
    val offs = counts.groupBy(g :+ col("__bk"): _*)
      .agg(sum("__c").as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(groupCols.map(c => col(c).as(s"__o_$c")) ++
        Seq(col("__bk").as("__bk2"), col("__off")): _*)
    val wIn = Window.partitionBy(g :+ col("__bk"): _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joinKeys = groupCols.map(c =>
        col(c) <=> col(s"__o_$c")) :+ (col("__bk") <=> col("__bk2"))
    val cum = counts.join(offs, joinKeys.reduce(_ && _))
      .select(g ++ Seq(col("__v"), col("__bk"),
        (col("__off") + sum(col("__c")).over(wIn)).as("__cum")): _*)
    val nRow = cum.groupBy(g: _*).agg(max("__cum").as("__n"))
    (cum, nRow)
  }

  /** Split-conformal calibration quantile per group: q̂ = the
    * ⌈(n+1)(1−α)⌉-th smallest calibration score — the finite-sample
    * coverage threshold conformal prediction deploys ("flag every new
    * score above q̂" then holds a ≥ 1−α guarantee under
    * exchangeability). The +1 is the point: a plain (1−α) quantile
    * UNDER-covers at finite n, and the failure is silent.
    *
    * Same two-phase grouped machinery as [[groupedQuantiles]] —
    * distinct-value collapse, bucket offsets, tiny rank probe — so it
    * holds at corpus scale; q̂ is an exact order statistic (a picked
    * value, no interpolation), raw-hashable.
    *
    * Loud degenerate: a group with n < ⌈(n+1)(1−α)⌉ — i.e. too few
    * calibration rows for the requested α (the conformal q̂ is +∞
    * there; deploying a threshold from it would silently flag
    * nothing).
    *
    * @return one row per group: (groupCols*, n, rank, qhat) */
  def conformalQuantile(df: DataFrame, groupCols: Seq[String],
      scoreCol: String, alpha: Double,
      bucket: Column => Column): DataFrame = {
    require(groupCols.nonEmpty,
      "conformalQuantile: need at least one group column")
    require(alpha > 0 && alpha < 1,
      s"conformalQuantile: alpha must be in (0,1): $alpha")
    val (cum, nRow) = groupedCum(df, groupCols, scoreCol, bucket)
    val g = groupCols.map(col)
    // rank = ceil((n+1)(1-alpha)) over EXACT decimal arithmetic (the
    // discRank BigDecimal discipline — double 1-alpha can land a hair
    // under a boundary and shift the rank)
    val oneMinus = (BigDecimal(1) - BigDecimal(alpha.toString)).toString
    val rank = ceil(lit(new java.math.BigDecimal(oneMinus)) *
      (col("__n") + 1)).cast("long")
    val qTable = nRow.select(
      groupCols.map(c => col(c).as(s"__q_$c")) ++
        Seq(col("__n"), rank.as("__r")): _*)
      .select(col("*"),
        when(col("__r") > col("__n"), raise_error(concat(lit(
          s"Selection.conformalQuantile: a group has too few " +
            s"calibration rows for alpha=$alpha (needs rank "),
          col("__r").cast("string"), lit(" of "),
          col("__n").cast("string"),
          lit(" rows) — the conformal threshold is +inf there"))))
          .otherwise(col("__r")).as("__rchk"))
    val probeKeys = (groupCols.map(c => col(c) <=> col(s"__q_$c")) :+
      (col("__cum") >= col("__rchk"))).reduce(_ && _)
    cum.join(qTable, probeKeys)
      .groupBy(groupCols.map(c => col(s"__q_$c").as(c)): _*)
      .agg(max(col("__n")).as("n"), max(col("__rchk")).as("rank"),
        min(col("__v")).as("qhat"))
      .select(g ++ Seq(col("n"), col("rank"), col("qhat")): _*)
  }

  def discRank(q: Double, n: Column): Column =
    greatest(lit(1L),
      ceil(lit(new java.math.BigDecimal(q.toString)) * n).cast("long"))

  /** `ntile(k) OVER ([PARTITION BY groupCols] ORDER BY orderCols)`
    * WITHOUT the scale-killing window: an unpartitioned ntile moves
    * every row to ONE task (and a ntile partitioned by a hot key —
    * a language column, say — moves most rows to one task all the
    * same). Same two-phase bucket-offset scheme as
    * [[Sequence.assignGlobalSeq]]: count rows per (group, bucket),
    * window over the COUNTS for running offsets and group totals
    * (one row per bucket — the only whole-group window, sized in
    * buckets by construction and marked via [[Bounded.constPart]]
    * when there are no group columns), then a per-(group, bucket)
    * `row_number` plus the broadcast offset gives each row's exact
    * global rank, and ntile membership is pure integer arithmetic on
    * (rank, n): the first `n % k` buckets take `n div k + 1` rows,
    * the rest `n div k` — bit-identical to the window function.
    *
    * @param bucket monotone NON-DECREASING coarsening of the
    *               `orderCols` total order (negate/flip for DESC
    *               leading keys; add an order-aligned tie-key slice
    *               for hot leading values). Bucket skew bounds
    *               per-task sort size.
    * @param orderCols total order (include a unique tie-break) —
    *                  required for a deterministic result
    * @return df plus `outCol` (INT, 1-based — the ntile contract) */
  def ntileScore(df: DataFrame, k: Int, groupCols: Seq[String],
      bucket: Column, orderCols: Seq[Column], outCol: String)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val withBk = df.withColumn("__nt_bk", bucket)
    val counts = withBk
      .groupBy((groupCols.map(col) :+ col("__nt_bk")): _*)
      .agg(count(lit(1)).as("__nt_c"))
    ntileApply(withBk, counts, k, groupCols, "__nt_bk", orderCols, outCol)
  }

  /** N [[ntileScore]] passes (global form) FUSED over one input — the
    * RFM shape ("score every customer on recency AND frequency AND
    * monetary"): sequential calls re-derive the (often expensive) base
    * for every pass's count side, while here ALL per-bucket count
    * tables come from ONE `GROUPING SETS ((bk₀),(bk₁),…)` aggregate —
    * a single scan with an Expand (×N rows of the count table, never
    * of data) — and the data side threads through the N broadcast
    * joins + bounded windows exactly as the sequential calls would.
    * Output is bit-identical to folding [[ntileScore]] over `specs`
    * (each spec's arithmetic touches only its own bucket/order/out).
    *
    * @param specs (bucket, orderCols, outCol) per score — the same
    *              contracts as [[ntileScore]]'s parameters */
  def ntileScores(df: DataFrame, k: Int,
      specs: Seq[(Column, Seq[Column], String)]): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(specs.nonEmpty, "ntileScores: need at least one spec")
    require(specs.forall(_._2.nonEmpty), "orderCols must be non-empty")
    require(specs.size <= 30, "ntileScores: grouping_id packs set " +
      s"membership in an int — at most 30 specs, got ${specs.size}")
    val n = specs.size
    val bkNames = specs.indices.map(i => s"__nt_bk$i")
    val withBks = specs.zip(bkNames).foldLeft(df) {
      case (acc, ((b, _, _), bn)) => acc.withColumn(bn, b)
    }
    // ALL count tables in one pass: grouping set i keeps only bkᵢ, so
    // its rows are exactly groupBy(bkᵢ).count — selected by the
    // grouping_id whose bits mark the AGGREGATED (masked) columns
    val counts = withBks
      .groupingSets(bkNames.map(bn => Seq(col(bn))), bkNames.map(col): _*)
      .agg(count(lit(1)).as("__nt_c"), grouping_id().as("__nt_gid"))
    val full = (1 << n) - 1
    specs.zip(bkNames).zipWithIndex.foldLeft(withBks) {
      case (acc, (((_, orderCols, outCol), bn), i)) =>
        val ci = counts.filter(col("__nt_gid") === (full - (1 << (n - 1 - i))))
          .select(col(bn), col("__nt_c"))
        ntileApply(acc, ci, k, Nil, bn, orderCols, outCol)
    }
  }

  /** Shared tail of the ntile family: bucket-offset windows over the
    * COUNT table, the offsets join, the per-bucket `row_number`, and
    * the exact integer ntile arithmetic. `counts` must hold one row
    * per (group, `bkName`) with the row count as `__nt_c`; `data` must
    * already carry `bkName`. Drops `bkName` (and only it) on the way
    * out so fused callers keep their other bucket columns. */
  private def ntileApply(data: DataFrame, counts: DataFrame, k: Int,
      groupCols: Seq[String], bkName: String, orderCols: Seq[Column],
      outCol: String): DataFrame = {
    val g = groupCols.map(col)
    val gb = g :+ col(bkName)
    // one row per (group, bucket): these windows run over COUNTS only.
    // With no group columns the partition spec would be empty — mark it
    // with the bounded-window constant instead (see Bounded.constPart)
    val part = if (g.isEmpty) Seq(Bounded.constPart(col("__nt_c"))) else g
    val wOff = Window.partitionBy(part: _*).orderBy(col(bkName))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(part: _*)
    // offsets + group totals ride the same one-row-per-bucket table
    val offs = counts
      .withColumn("__nt_off",
        coalesce(sum(col("__nt_c")).over(wOff), lit(0L)))
      .withColumn("__nt_n", sum(col("__nt_c")).over(wTot))
      .select((groupCols.map(n => col(n).as(s"__nt_g_$n")) ++
        Seq(col(bkName).as("__nt_bko"), col("__nt_off"),
          col("__nt_n"))): _*)
    val cond = (groupCols.map(n => col(n) <=> col(s"__nt_g_$n")) :+
      (col(bkName) <=> col("__nt_bko"))).reduce(_ && _)
    // the GLOBAL form's offs is one row per bucket — bounded by
    // construction, broadcast-safe. A GROUPED offs is groups×buckets
    // rows: with a high-cardinality group key that exceeds broadcast
    // limits, so it joins plain (the groupedQuantiles discipline —
    // the shuffle it costs feeds the (group, bucket) window anyway)
    val offsSide = if (g.isEmpty) broadcast(offs) else offs
    val wIn = Window.partitionBy(gb: _*).orderBy(orderCols: _*)
    val ranked = data.join(offsSide, cond)
      .withColumn("__nt_rk",
        col("__nt_off") + row_number().over(wIn).cast("long"))
    // exact ntile arithmetic; the else-branch divisor is guarded with
    // greatest(..., 1) because when n div k = 0 every rank falls in
    // the when-branch (r <= (n % k) * 1 = n) and the else is dead
    val scored = ranked.withColumn(outCol,
      when(col("__nt_rk") <=
          (col("__nt_n") % k) * (expr(s"__nt_n div $k") + lit(1L)),
        expr(s"(__nt_rk - 1) div ((__nt_n div $k) + 1) + 1"))
        .otherwise((col("__nt_n") % k) + expr(
          s"(__nt_rk - (__nt_n % $k) * ((__nt_n div $k) + 1) - 1) " +
            s"div greatest(__nt_n div $k, 1) + 1"))
        .cast("int"))
    scored
      .drop(bkName, "__nt_bko", "__nt_off", "__nt_n", "__nt_rk")
      .drop(groupCols.map(n => s"__nt_g_$n"): _*)
  }

  /** @param bucket coarsening of the value order (e.g. `v =>
    *               floor(v / 1000)`) — must be monotone in `v`; bucket
    *               skew bounds per-task work exactly as in
    *               assignGlobalSeq
    * @return one row per q: (q, n, value) */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      bucket: Column => Column): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    val (cum, nRow) = cumAndN(df, valueCol, bucket, "exactQuantiles")
    quantileSelect(cum, nRow, qs)
  }

  /** WEIGHTED discrete quantiles (round 10): the value at the smallest
    * `v` whose cumulative WEIGHT reaches `ceil(q·W)` — the
    * token-weighted / byte-weighted percentile a corpus pipeline asks
    * for ("median doc length BY TOKEN MASS, not by doc count"). Same
    * two-phase machinery and guarantees as [[exactQuantiles]] with
    * per-value weight sums in place of counts.
    *
    * Weights must be POSITIVE integers (token counts, byte sizes) —
    * exactness rides the long weight sums. Zero-weight rows carry no
    * mass and are excluded (as are null weights/values); a NEGATIVE
    * weight would silently corrupt every downstream rank, so it raises
    * in-plan (the loud-guard idiom).
    *
    * @return one row per q: (q, n = total weight W, value) */
  def weightedQuantiles(df: DataFrame, valueCol: String,
      weightCol: String, qs: Seq[Double], bucket: Column => Column)
      : DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    val w = col(weightCol).cast("long")
    val guarded = df
      .filter(col(weightCol).isNotNull && w =!= 0L)
      .withColumn("__wq_w",
        when(w < 0, raise_error(concat(
          lit("weightedQuantiles: negative weight "), w.cast("string"))))
          .otherwise(w))
    val (cum, nRow) = cumAndN(guarded, valueCol, bucket,
      "weightedQuantiles", col("__wq_w"))
    quantileSelect(cum, nRow, qs)
  }

  /** PER-GROUP discrete quantiles (round 10): [[exactQuantiles]] for
    * every group in one pass — "p50/p90 doc length PER LANGUAGE" —
    * without any per-group sort of raw rows. Same two-phase scheme with
    * the group key prepended everywhere: the offset window runs over
    * the per-(group, bucket) COUNT table partitioned by group (rows =
    * buckets, never data), the in-bucket window partitions by
    * (group, bucket), and the rank probe is an EQUI join on the group
    * key with the `cum ≥ rank` residual — no broadcast needed, so the
    * group count is unbounded (millions of keys shuffle-partition
    * normally; a hot group is still bounded per task by its buckets).
    *
    * Empty input ⇒ empty output (the grouped contract — there is no
    * "the" total to guard); groups are only ever observed ones, so
    * every (group, q) row carries a value.
    *
    * @return one row per (group, q): (groupCols…, q, n, value) with n
    *         the group's non-null count and `value` its
    *         percentile_disc(q) */
  def groupedQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, qs: Seq[Double], bucket: Column => Column)
      : DataFrame = {
    require(groupCols.nonEmpty,
      "groupedQuantiles: use exactQuantiles for the global form")
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0,1]: $qs")
    val (cum, nRow) = groupedCum(df, groupCols, valueCol, bucket)
    val g = groupCols.map(col)
    val ranks = qs.map(q => struct(lit(q).as("q"),
      discRank(q, col("__n")).as("__r")))
    val qTable = nRow.select(g :+ col("__n") :+
        explode(array(ranks: _*)).as("__qr"): _*)
      .select(groupCols.map(c => col(c).as(s"__q_$c")) ++
        Seq(col("__n"), col("__qr.q").as("q"), col("__qr.__r")): _*)
    val probeKeys = (groupCols.map(c => col(c) <=> col(s"__q_$c")) :+
      (col("__cum") >= col("__r"))).reduce(_ && _)
    cum.join(qTable, probeKeys)
      .groupBy(groupCols.map(c => col(s"__q_$c").as(c)) :+ col("q"): _*)
      .agg(max(col("__n")).as("n"), min(col("__v")).as("value"))
      .select(g ++ Seq(col("q"), col("n"), col("value")): _*)
  }

  /** Rank-probe tail shared by both quantile flavors: tiny-side
    * broadcast through the non-equi rank probe; min per q. The final
    * left join anchors output on qTable — built from a global
    * aggregate, which produces its row even on empty input, so the
    * empty guard cannot be pruned by AQE's empty-relation propagation
    * (the Drift.ks lesson). q ≤ 1 ⇒ rank ≤ n, so every q matches at
    * least one cum row and `value` is never null past the guard. */
  private def quantileSelect(cum: DataFrame, nRow: DataFrame,
      qs: Seq[Double]): DataFrame = {
    val ranks = qs.map(q => struct(lit(q).as("q"),
      discRank(q, col("__n")).as("__r")))
    val qTable = nRow.select(col("__n"),
      explode(array(ranks: _*)).as("__qr"))
      .select(col("__n"), col("__qr.q").as("q"), col("__qr.__r"))
    val res = cum.join(broadcast(qTable), col("__cum") >= col("__r"))
      .groupBy(col("q"))
      .agg(min(col("__v")).as("value"))
    qTable.select(col("q"), col("__n").as("n"))
      .join(res, Seq("q"), "left")
  }

  /** Per-distinct-value cumulative mass (the shared two-phase running
    * count/weight) and the loudly-guarded 1-row total. Extracted from
    * [[exactQuantiles]] so every quantile flavor shares one plan shape;
    * `weight` defaults to 1 per row (plain counts) and must be a
    * non-null positive long for the weighted flavor (guarded there). */
  private def cumAndN(df: DataFrame, valueCol: String,
      bucket: Column => Column, opName: String,
      weight: Column = lit(1L)): (DataFrame, DataFrame) = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(weight).as("__c"))
      .withColumn("__bk", bucket(col("__v")))
    // Bounded.constPart: the bounded-window marker (see Sequence) —
    // input is one row per bucket, never data rows
    val wOff = Window.partitionBy(Bounded.constPart(col("__t")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.groupBy(col("__bk"))
      .agg(sum("__c").as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__off"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .select(col("__v"),
        (col("__off") + sum(col("__c")).over(wIn)).as("__cum"))
    // global aggregate: ONE row even on empty input, so the guard
    // cannot be pruned (the Drift.ks lesson)
    val nRow = cum.groupBy()
      .agg(coalesce(max("__cum"), lit(0L)).as("__n"))
      .select(when(col("__n") === 0, raise_error(lit(
        s"$opName: no non-null values"))).otherwise(col("__n"))
        .as("__n"))
    (cum, nRow)
  }

  /** `percentile_cont` semantics over the same machinery: the
    * interpolated quantile `v_lo + (v_hi − v_lo)·frac` at 0-based
    * position `h = (n−1)·q`, where lo/hi are the bracketing ranks and
    * `frac = h − ⌊h⌋`. Two rank probes ride ONE broadcast join (each q
    * explodes into its lo and hi rank rows). The interpolation is a
    * fixed IEEE sequence over the exact selected values, so results
    * hash cross-engine against an oracle replaying the same expression.
    *
    * @return one row per q: (q, n, value) — value is DOUBLE
    */
  def exactQuantilesCont(df: DataFrame, valueCol: String,
      qs: Seq[Double], bucket: Column => Column): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    require(qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0,1]: $qs")
    val (cum, nRow) = cumAndN(df, valueCol, bucket, "exactQuantilesCont")
    val cumD = cum.select(col("__v").cast("double").as("__v"),
      col("__cum"))
    val qRows = qs.map { q =>
      val h = lit(q) * (col("__n") - lit(1L)).cast("double")
      struct(lit(q).as("q"), h.as("h"),
        (floor(h).cast("long") + lit(1L)).as("rlo"),
        (ceil(h).cast("long") + lit(1L)).as("rhi"))
    }
    val qTable = nRow.select(col("__n"),
        explode(array(qRows: _*)).as("__qr"))
      .select(col("__n"), col("__qr.q").as("q"), col("__qr.h").as("h"),
        col("__qr.rlo").as("rlo"), col("__qr.rhi").as("rhi"))
    val probes = qTable.select(col("q"),
        explode(array(
          struct(lit("lo").as("side"), col("rlo").as("r")),
          struct(lit("hi").as("side"), col("rhi").as("r")))).as("__p"))
      .select(col("q"), col("__p.side"), col("__p.r"))
    val picked = cumD.join(broadcast(probes), col("__cum") >= col("r"))
      .groupBy(col("q"))
      .agg(min(when(col("side") === "lo", col("__v"))).as("__vlo"),
        min(when(col("side") === "hi", col("__v"))).as("__vhi"))
    qTable.join(picked, Seq("q"), "left")
      .select(col("q"), col("__n").as("n"),
        (col("__vlo") + (col("__vhi") - col("__vlo")) *
          (col("h") - floor(col("h")))).as("value"))
  }
}
