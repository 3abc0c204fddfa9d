package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Exact

/** Tabular feature engineering — the data-prep operators between raw
  * tables and a trainer (discretization, category encodings,
  * dependency screening). All three keep the repo's exact-arithmetic
  * contract: integer rank math, decimal-exact sums, and IEEE op
  * sequences that reproduce bit-identically in any engine.
  */
object Features {

  /** Equi-depth (quantile) discretization: per group, bin each row by
    * its rank — `bin = ⌊(rank−1)·nbins / n⌋` over the total order
    * (valueCol, tieBreak...) — so bins hold equal row counts (±1), the
    * discretization GBDTs and histogram features want where equi-WIDTH
    * bins collapse under heavy tails. Pure integer math (no percentile
    * interpolation); one window pass per group, rows never re-shuffle.
    * The tie-break columns must make the order total or ranks (and thus
    * bins) are nondeterministic — same contract as the window gates. */
  def equiDepthBins(df: DataFrame, groupCols: Seq[String],
      valueCol: String, nbins: Int,
      tieBreak: Seq[String]): DataFrame = {
    require(nbins > 0, s"nbins must be positive, got $nbins")
    require(tieBreak.nonEmpty, "tie-break columns required (total order)")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy((valueCol +: tieBreak).map(col): _*)
    val n = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("bin",
        floor((col("__rk") - 1).cast("long") * nbins / col("__n"))
          .cast("int"))
      .drop("__rk", "__n")
  }

  /** Leave-one-out target (mean) encoding: each row's category encodes
    * as the mean of the target over the OTHER rows of its category —
    * `(S_cat − target) / (n_cat − 1)` — the leakage-safe form of mean
    * encoding (plain per-category means let a row see its own label).
    * Singleton categories encode null (no other rows to average).
    * One partial-agg pass per category + a broadcast stats join back;
    * the 2-dp target sums in DECIMAL (exact, order-independent), so the
    * subtraction is exact and the single division bit-reproducible. */
  def targetEncodeLoo(df: DataFrame, catCol: String,
      targetCol: String): DataFrame = {
    val stats = df.groupBy(catCol).agg(
      sum(col(targetCol).cast(Exact.Money)).as("__s"),
      count(lit(1)).as("__n"))
    df.join(broadcast(stats), Seq(catCol), "left")
      .withColumn("target_enc",
        when(col("__n") > 1,
          (col("__s") - col(targetCol).cast(Exact.Money)).cast("double")
            / (col("__n") - 1))
          .otherwise(lit(null).cast("double")))
      .drop("__s", "__n")
  }

  /** Pairwise Pearson correlation over 2-dp numeric columns, exactly
    * and in pure LONG arithmetic: values scale to integer cents
    * (`⌊x·100 + 0.5⌋`, the cross-engine rounding recipe), per-row
    * products split into 32-bit halves (`p >> 32`, `p & 0xffffffff`)
    * whose sums stay inside a long, and each exact moment reassembles
    * ONCE at the end as `Σhi·2³² + Σlo` in decimal — so the whole
    * per-row path is codegen'd long math (a first draft summing 4-dp
    * DECIMAL products paid BigDecimal churn on every row: 61 s at the
    * 32× drill vs ~6 s for this form). The final
    * `corr = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))`
    * is a fixed IEEE sequence over those exactly-derived doubles —
    * sqrt is correctly rounded by IEEE-754, so results are
    * bit-identical in any engine replaying the same ops (DuckDB sums
    * the raw products in HUGEINT and lands the identical integers).
    *
    * Bounds, ALL guarded in-plan: Σlo < n·2³², so one call handles
    * n ≤ 2³¹ rows (≈2.1e9), and |cents| ≤ ⌊√(2⁶³)⌋ so no per-row
    * product wraps (max(abs) rides the same aggregation) — beyond
    * either, shard the input and merge the (mergeable) hi/lo moment
    * sums. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val B = 4294967296L // 2^32
    val prep = df.select(cols.map(c =>
      guardCents(floor(col(c) * 100 + lit(0.5)).cast("long"),
        "corrMatrix", c).as(s"__c_$c")): _*)
    def hi(p: Column) = shiftright(p, 32)
    def lo(p: Column) = p.bitwiseAND(lit(0xffffffffL))
    def prodAggs(a: String, b: String) = {
      val p = col(s"__c_$a") * col(s"__c_$b")
      Seq(sum(hi(p)).as(s"__hi_${a}_$b"), sum(lo(p)).as(s"__lo_${a}_$b"))
    }
    val aggs = cols.flatMap(c =>
      sum(col(s"__c_$c")).as(s"__s_$c") +: prodAggs(c, c)) ++
      pairsOf(cols).flatMap { case (a, b) => prodAggs(a, b) } ++
      cols.map(c => count(col(s"__c_$c")).as(s"__nn_$c")) :+
      count(lit(1)).as("__n")
    val m = prep.agg(aggs.head, aggs.tail: _*)
      .withColumn("__n",
        when(col("__n") > (1L << 31), raise_error(lit(
          "corrMatrix: > 2^31 rows in one call — shard the input and " +
            "merge the hi/lo moment sums")))
          // nulls would silently skew the moments (counted in n, absent
          // from the sums): Pearson over incomplete observations is the
          // caller's modeling decision, not a silent default
          .when(cols.map(c => col(s"__nn_$c") =!= col("__n"))
            .reduce(_ || _), raise_error(lit(
            "corrMatrix: null values present — filter or impute first")))
          .otherwise(col("__n")))
    def moment(a: String, b: String): Column =
      (col(s"__hi_${a}_$b").cast(DecimalWide) * B +
        col(s"__lo_${a}_$b").cast(DecimalWide)).cast("double")
    val rows = pairsOf(cols).map { case (a, b) =>
      val n = col("__n").cast("double")
      val sx = col(s"__s_$a").cast("double")
      val sy = col(s"__s_$b").cast("double")
      val sxx = moment(a, a)
      val syy = moment(b, b)
      val sxy = moment(a, b)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
          .as("corr"))
    }
    m.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_a"), col("__r.col_b"), col("__r.corr"))
  }

  /** Per-GROUP Pearson correlation between two 2-dp columns — the
    * grouped form of [[corrMatrix]] (per-entity signal screening;
    * autocorrelation when `yCol` is a lagged copy of `xCol`). Same
    * exactness machinery: integer cents, 32-bit hi/lo product sums in
    * pure long math, one reassembly per GROUP (not per row), fixed
    * IEEE closed form over exact doubles → raw correlations hash.
    * Same guards, per group: > 2³¹ rows or null values raise in-plan.
    * Groups with < 2 pairs or zero variance on either side emit null.
    * One partial-aggregating shuffle; group state is 9 longs. */
  def groupedCorr(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "group columns required")
    val B = 4294967296L
    val prep = df.select(groupCols.map(col) ++ Seq(
      guardCents(floor(col(xCol) * 100 + lit(0.5)).cast("long"),
        "groupedCorr", xCol).as("__x"),
      guardCents(floor(col(yCol) * 100 + lit(0.5)).cast("long"),
        "groupedCorr", yCol).as("__y")): _*)
    def hi(p: Column) = shiftright(p, 32)
    def lo(p: Column) = p.bitwiseAND(lit(0xffffffffL))
    def hl(p: Column, tag: String) =
      Seq(sum(hi(p)).as(s"__hi_$tag"), sum(lo(p)).as(s"__lo_$tag"))
    val aggs = Seq(count(lit(1)).as("__n"),
      count(col("__x")).as("__nx"), count(col("__y")).as("__ny"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy")) ++
      hl(col("__x") * col("__x"), "xx") ++
      hl(col("__y") * col("__y"), "yy") ++
      hl(col("__x") * col("__y"), "xy")
    val m = prep.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__n",
        when(col("__n") > (1L << 31), raise_error(lit(
          "groupedCorr: > 2^31 rows in one group — shard and merge the " +
            "hi/lo moment sums")))
          .when(col("__nx") =!= col("__n") || col("__ny") =!= col("__n"),
            raise_error(lit(
              "groupedCorr: null values present — filter or impute " +
                "first")))
          .otherwise(col("__n")))
    def moment(tag: String): Column =
      (col(s"__hi_$tag").cast(DecimalWide) * B +
        col(s"__lo_$tag").cast(DecimalWide)).cast("double")
    val n = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val num = n * moment("xy") - sx * sy
    val dx = n * moment("xx") - sx * sx
    val dy = n * moment("yy") - sy * sy
    m.select(groupCols.map(col) :+ col("__n").as("n_pairs") :+
      when(col("__n") >= 2 && dx > 0 && dy > 0,
        num / (sqrt(dx) * sqrt(dy))).as("corr"): _*)
  }

  /** Categorical dependence screening between two discrete columns —
    * the contingency table with each cell's chi-square and mutual-
    * information contribution: the categorical complement of
    * [[corrMatrix]] (feature↔feature and feature↔label screening).
    * Emitted PER CELL rather than summed so the gate carries no
    * fold-order FP at all: observed/row/col/total counts are exact
    * integers, `expected = rowTot·colTot/n` and the chi² term
    * `(o−e)²/e` are fixed per-cell IEEE sequences (raw-hashable), and
    * only the MI term (`(o/n)·ln(o·n/(rowTot·colTot))`, transcendental)
    * rounds at 6 dp. Null categories form their own cell — screening
    * should SEE missingness, not drop it. Scale: one (a,b) count
    * shuffle; marginals are partial-agg tables broadcast back; cells =
    * |A|·|B| regardless of row count. */
  def catDependence(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("observed"))
    // null-SAFE marginal joins: a null category is a real cell (the
    // missingness signal screening exists to see), and a plain USING
    // join would silently drop it
    val rowT = cells.groupBy("a").agg(sum("observed").as("row_total"))
      .withColumnRenamed("a", "__ra")
    val colT = cells.groupBy("b").agg(sum("observed").as("col_total"))
      .withColumnRenamed("b", "__rb")
    val tot = cells.agg(sum("observed").as("__n"))
    cells
      .join(broadcast(rowT), col("a") <=> col("__ra")).drop("__ra")
      .join(broadcast(colT), col("b") <=> col("__rb")).drop("__rb")
      .crossJoin(broadcast(tot))
      .withColumn("expected",
        col("row_total").cast("double") * col("col_total") / col("__n"))
      .withColumn("chi2_term",
        (col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"))
      .withColumn("mi_term", round(
        (col("observed").cast("double") / col("__n")) *
          log(col("observed").cast("double") * col("__n") /
            (col("row_total").cast("double") * col("col_total"))), 6))
      .select("a", "b", "observed", "row_total", "col_total",
        "expected", "chi2_term", "mi_term")
  }

  /** Cramér's V — the SINGLE [0, 1] association strength for a
    * contingency table (the summary number next to [[catDependence]]'s
    * per-cell χ²/MI screen): `V = sqrt(χ² / (n · (min(r,c) − 1)))`
    * with the bias-free identity `χ² = n·(Σ o²/(rt·ct)) − n` so every
    * input to the float chain is an exact integer product.
    *
    * Shape: one (a, b) cell shuffle; marginals are tiny aggregates
    * over the cell table. The cross-cell Σ o²/(rt·ct) is a SORTED
    * SEQUENTIAL FOLD over per-cell terms (the kruskalWallis
    * discipline: bounded cell count guarded loudly, fold order =
    * (a, b) ascending — bit-identical to the oracle's list_reduce), V
    * shipped RAW (sqrt is IEEE-exact).
    *
    * Loud degenerates: an empty table, a single row or column
    * category (V is 0/0), more than `maxCells` cells.
    *
    * @return one row: (n, n_rows, n_cols, v) */
  def cramersV(df: DataFrame, aCol: String, bCol: String,
      maxCells: Int = 100000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .agg(count(lit(1)).as("__o"))
    val rowT = cells.groupBy(col("__a")).agg(sum("__o").as("__rt"))
      .withColumnRenamed("__a", "__ra")
    val colT = cells.groupBy(col("__b")).agg(sum("__o").as("__ct"))
      .withColumnRenamed("__b", "__rb")
    val term = (col("__o").cast(dec) * col("__o").cast(dec))
      .cast("double") /
      (col("__rt").cast(dec) * col("__ct").cast(dec)).cast("double")
    val folded = cells
      .join(broadcast(rowT), col("__a") <=> col("__ra")).drop("__ra")
      .join(broadcast(colT), col("__b") <=> col("__rb")).drop("__rb")
      .agg(count(lit(1)).as("__cells"),
        coalesce(sum("__o"), lit(0L)).as("n"),
        countDistinct(col("__a")).as("n_rows"),
        countDistinct(col("__b")).as("n_cols"),
        sort_array(collect_list(struct(col("__a"), col("__b"),
          term.as("__t")))).as("__terms"))
    val s = aggregate(transform(col("__terms"),
      x => x.getField("__t")), lit(0.0), (acc, x) => acc + x)
    val nD = col("n").cast("double")
    val minDim = (least(col("n_rows"), col("n_cols")) - 1).cast("double")
    folded.select(
      when(col("n") === 0, raise_error(lit(
        "Features.cramersV: empty table")))
        .when(col("__cells") > maxCells, raise_error(concat(
          lit(s"Features.cramersV: more than $maxCells cells (the " +
            "fold collects one term per cell) — got "),
          col("__cells").cast("string"))))
        .otherwise(col("n")).as("n"),
      col("n_rows"), col("n_cols"),
      when(col("n_rows") < 2 || col("n_cols") < 2, raise_error(lit(
        "Features.cramersV: a single row or column category — V is " +
          "0/0")))
        .otherwise(sqrt(greatest(lit(0.0), nD * s - nD) / (nD * minDim)))
        .as("v"))
  }

  /** 38,0-capable headroom for Σ(x·y) reassembly. */
  private val DecimalWide =
    org.apache.spark.sql.types.DecimalType(38, 0)

  /** ⌊√(2⁶³)⌋: the largest |cents| whose pairwise Long product cannot
    * wrap (3037000499² < 2⁶³ ≤ 3037000500²) — values past ~3.0e7 in
    * the original unit trip the in-plan magnitude guard. */
  private val MaxCents = 3037000499L

  /** Per-row magnitude guard on the scaled-cents value, applied BEFORE
    * any product: past ⌊√(2⁶³)⌋ the pairwise Long multiply would wrap
    * silently in non-ANSI Spark (and raise an opaque
    * ARITHMETIC_OVERFLOW in ANSI) — fail loudly with the sharding
    * remedy instead. One codegen'd branch per value per row. */
  private def guardCents(cents: Column, op: String, name: String): Column =
    when(abs(cents) > MaxCents, raise_error(lit(
      s"$op: |$name| beyond ${MaxCents / 100} (cents beyond the " +
        "long-product range) — rescale the column or shard by magnitude")))
      .otherwise(cents)

  private def pairsOf(cols: Seq[String]): Seq[(String, String)] =
    for {
      i <- cols.indices
      j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
}
