package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series feature extraction: previous value, delta, and
  * exponential moving average per event — the feature-engineering pass
  * every behavioral/training-signal pipeline runs over an event log.
  *
  * The EMA is a sequential recurrence (`ema_i = α·v_i + (1−α)·ema_{i−1}`,
  * seeded with the first value), which no window frame expresses — the
  * same class as [[Chunking.sentences]]' greedy fold, solved the same
  * Spark-first way: ONE groupBy(key) shuffle collects each key's events,
  * an in-row `array_sort` orders them by (ts, id), one `aggregate` fold
  * computes prev/delta/EMA for every element, and `explode` restores
  * row-per-event. No window sorts, no second exchange, no driver state.
  *
  * Scale note: a key's whole history rides one row through the fold, so
  * per-key cardinality must fit an executor row (true for user-keyed
  * event logs; a key with unbounded history belongs in the streaming
  * form — [[graft.streaming.StreamOps.statefulTransform]] holds the same
  * running state with watermark eviction).
  */
object TimeSeries {

  /** Returns (keyCol, idCol, tsCol, value, prev_value, delta, ema):
    * one row per input event, ordered-by-(ts, id) semantics per key.
    * `prev_value`/`delta` are null on each key's first event.
    * `maxEventsPerKey` is the hot-key guard: a key whose history
    * exceeds it fails LOUDLY in-plan (the maxBroadcastProbes
    * discipline) rather than OOMing an executor on one giant row —
    * route such keys to the streaming stateful form or pre-window. */
  def emaFeatures(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, alpha: Double,
      maxEventsPerKey: Int = 1 << 20): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val collected = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
        col(tsCol).as("ts"), col(idCol).as("id"),
        col(valCol).cast("double").as("v")))).as("__evs"))
      .withColumn("__evs", when(size(col("__evs")) > maxEventsPerKey,
        raise_error(concat(
          lit("emaFeatures: key "), col(keyCol).cast("string"),
          lit(s" exceeds $maxEventsPerKey events in one in-row fold; " +
            "raise maxEventsPerKey, pre-window the log, or route hot " +
            "keys to the streaming stateful form"))))
        .otherwise(col("__evs")))
    // fold state: (prev value or null, prev ema or null, out rows)
    val zero = struct(
      lit(null).cast("double").as("pv"),
      lit(null).cast("double").as("pema"),
      array().cast(
        "array<struct<id:bigint,ts:timestamp,v:double," +
          "prev_value:double,delta:double,ema:double>>").as("out"))
    val folded = aggregate(col("__evs"), zero, (st, e) => {
      val ema = when(st.getField("pema").isNull, e.getField("v"))
        .otherwise(e.getField("v") * alpha +
          st.getField("pema") * (1.0 - alpha))
      struct(
        e.getField("v").as("pv"),
        ema.as("pema"),
        concat(st.getField("out"), array(struct(
          e.getField("id").cast("bigint").as("id"),
          e.getField("ts").as("ts"),
          e.getField("v").as("v"),
          st.getField("pv").as("prev_value"),
          (e.getField("v") - st.getField("pv")).as("delta"),
          ema.as("ema")))).as("out"))
    })
    collected
      .select(col(keyCol), explode(folded.getField("out")).as("__e"))
      .select(col(keyCol), col("__e.id").as(idCol),
        col("__e.ts").as(tsCol), col("__e.v").as("value"),
        col("__e.prev_value"), col("__e.delta"), col("__e.ema"))
  }

  /** Fixed-grid resampling with forward fill — the gap-filling pass that
    * turns an irregular event log into the regular series every
    * downstream feature window / anomaly detector assumes (pandas
    * `resample().ffill()`, at corpus scale). Each key's observed span is
    * divided into `intervalSec` slots; a slot's value is its LAST
    * observation by (ts, id), and empty slots inherit the most recent
    * earlier value (`is_gap` marks them; leading values are never
    * invented — the grid starts at each key's first observed slot).
    *
    * Slot arithmetic is integer microseconds end-to-end (`unix_micros
    * div interval`) — sub-second timestamps bucket exactly, no
    * double rounding anywhere.
    *
    * Scale shape: one (key, slot) partial-agg shuffle collapses the
    * event log to slot grain FIRST (the 100 TB reduction step), then the
    * grid explode, gap join, and forward-fill window all run at slot
    * grain — keyed by (key, slot) / key, carrying 8-byte values. A key's
    * slot count is span/interval, bounded by construction; the fill
    * window is the standard `last(ignoreNulls)` running frame.
    *
    * Returns (keyCol, slot_ts, n_obs, is_gap, value). */
  /** Floor-division slot of epoch-µs by a positive interval. Plain `div`
    * truncates toward ZERO, which merges the two slots straddling the
    * epoch for pre-1970 timestamps and diverges from DuckDB's flooring
    * `//`; subtracting the (always non-negative) pmod first makes the
    * division exact integer floor at any epoch magnitude. */
  private def slotOf(tsCol: String, us: Long) =
    expr(s"(unix_micros(`$tsCol`) - pmod(unix_micros(`$tsCol`), $us))" +
      s" div $us")

  def resample(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec > 0, s"intervalSec must be positive: $intervalSec")
    val us = intervalSec * 1000000L
    val slotted = df.select(col(keyCol),
      slotOf(tsCol, us).as("__slot"),
      struct(col(tsCol), col(idCol), col(valCol).cast("double").as("v"))
        .as("__obs"))
    val perSlot = slotted.groupBy(col(keyCol), col("__slot"))
      .agg(count(lit(1)).as("n_obs"),
        max(col("__obs")).getField("v").as("__last"))
    val grid = perSlot.groupBy(col(keyCol))
      .agg(min("__slot").as("__s0"), max("__slot").as("__s1"))
      .select(col(keyCol),
        explode(sequence(col("__s0"), col("__s1"))).as("__slot"))
    val w = Window.partitionBy(keyCol).orderBy("__slot")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, Seq(keyCol, "__slot"), "left")
      .select(col(keyCol),
        timestamp_micros(col("__slot") * us).as("slot_ts"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("__last").isNull.as("is_gap"),
        last(col("__last"), ignoreNulls = true).over(w).as("value"))
  }

  /** [[resample]] with LINEAR interpolation across gaps instead of
    * forward-fill — the reconstruction read for continuously-varying
    * metrics (a gauge between scrapes), where ffill's step function
    * biases downstream means. Same grid + per-slot-last machinery; gap
    * slots take `pv + (nv − pv) · (slot − ps)/(ns − ps)` between the
    * bracketing known slots (the grid spans known endpoints, so both
    * brackets always exist — no extrapolation). The arithmetic is one
    * fixed IEEE sequence over exact slot integers and the raw values,
    * so raw doubles hash cross-engine. */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec > 0, s"intervalSec must be positive: $intervalSec")
    val us = intervalSec * 1000000L
    val slotted = df.select(col(keyCol),
      slotOf(tsCol, us).as("__slot"),
      struct(col(tsCol), col(idCol), col(valCol).cast("double").as("v"))
        .as("__obs"))
    val perSlot = slotted.groupBy(col(keyCol), col("__slot"))
      .agg(count(lit(1)).as("n_obs"),
        max(col("__obs")).getField("v").as("__last"))
    val grid = perSlot.groupBy(col(keyCol))
      .agg(min("__slot").as("__s0"), max("__slot").as("__s1"))
      .select(col(keyCol),
        explode(sequence(col("__s0"), col("__s1"))).as("__slot"))
    val base = Window.partitionBy(keyCol).orderBy("__slot")
    val wp = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val knownSlot = when(col("__last").isNotNull, col("__slot"))
    grid.join(perSlot, Seq(keyCol, "__slot"), "left")
      .withColumn("__pv", last(col("__last"), ignoreNulls = true).over(wp))
      .withColumn("__ps", last(knownSlot, ignoreNulls = true).over(wp))
      .withColumn("__nv", first(col("__last"), ignoreNulls = true).over(wn))
      .withColumn("__ns", first(knownSlot, ignoreNulls = true).over(wn))
      .select(col(keyCol),
        timestamp_micros(col("__slot") * us).as("slot_ts"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("__last").isNull.as("is_gap"),
        when(col("__last").isNotNull, col("__last"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            ((col("__slot") - col("__ps")).cast("double") /
              (col("__ns") - col("__ps")).cast("double")))
          .as("value"))
  }

  /** OHLC bars — the canonical event-stream downsampling (finance
    * candles; equally the per-interval first/last/extremes summary any
    * metric stream wants): per (key, interval slot), the first (open)
    * and last (close) value in (ts, id) order plus high/low/count.
    *
    * ONE partial-aggregating groupBy: open/close ride `min_by`/`max_by`
    * over the (ts, id) struct — no window sort, no per-key ordering
    * shuffle; slot grain is integer-µs bucket math (the [[resample]]
    * discipline, sub-second timestamps bucket exactly). Values ride
    * through untouched, so raw doubles hash cross-engine.
    *
    * Returns (keyCol, slot, slot_start, open, high, low, close, n). */
  def ohlc(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      valCol: String, intervalSec: Long): DataFrame = {
    require(intervalSec > 0, s"intervalSec must be positive: $intervalSec")
    val us = intervalSec * 1000000L
    df.select(col(keyCol),
        slotOf(tsCol, us).as("slot"),
        struct(col(tsCol), col(idCol)).as("__ord"),
        col(valCol).cast("double").as("__v"))
      .groupBy(col(keyCol), col("slot"))
      .agg(min_by(col("__v"), col("__ord")).as("open"),
        max(col("__v")).as("high"), min(col("__v")).as("low"),
        max_by(col("__v"), col("__ord")).as("close"),
        count(lit(1)).as("n"))
      .withColumn("slot_start", timestamp_micros(col("slot") * us))
  }

  /** Two-sided CUSUM change-point detection (Page 1954) over a per-key
    * series — the sequential shift monitor the seasonal/zscore family
    * can't express: `S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − μ − slack))`,
    * `S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (μ − xᵢ − slack))`, alarm when either
    * exceeds `threshold`. μ is the per-key baseline (caller-supplied
    * column, e.g. the first week's mean); slack (the allowance k)
    * absorbs noise, threshold h sets sensitivity.
    *
    * A sequential recurrence no window frame expresses — solved as the
    * [[emaFeatures]] shape: ONE groupBy(key) shuffle, in-row
    * `array_sort` + `aggregate` fold, explode back. Chained double
    * arithmetic in a fixed op order, so the DuckDB recursive-CTE
    * oracle replays it bit-identically (the EMA precedent) and RAW
    * statistics hash.
    *
    * @param muCol per-key baseline mean column (present on every row)
    * @return (key, slot, value, s_pos, s_neg, alarm) */
  def cusum(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, muCol: String, slack: Double, threshold: Double,
      maxEventsPerKey: Int = 1 << 20): DataFrame = {
    require(slack >= 0, s"slack must be >= 0: $slack")
    require(threshold > 0, s"threshold must be > 0: $threshold")
    val collected = df
      .select(col(keyCol), col(muCol).cast("double").as("__mu"),
        struct(col(slotCol).as("s"), col(valCol).cast("double").as("v"))
          .as("__e"))
      .groupBy(keyCol)
      .agg(first(col("__mu")).as("__mu"),
        sort_array(collect_list(col("__e"))).as("__es"))
      .withColumn("__es", when(size(col("__es")) > maxEventsPerKey,
        raise_error(concat(
          lit("cusum: key "), col(keyCol).cast("string"),
          lit(s" exceeds $maxEventsPerKey rows in one in-row fold; " +
            "pre-aggregate to a coarser slot grain"))))
        .otherwise(col("__es")))
    val outType = "array<struct<s:" +
      df.select(col(slotCol)).schema.head.dataType.sql + ",v:double," +
      "s_pos:double,s_neg:double>>"
    val zero = struct(lit(0.0).as("sp"), lit(0.0).as("sn"),
      array().cast(outType.toLowerCase).as("out"))
    val folded = aggregate(col("__es"), zero, (st, e) => {
      val sp = greatest(lit(0.0), st.getField("sp") +
        (e.getField("v") - col("__mu") - slack))
      val sn = greatest(lit(0.0), st.getField("sn") +
        (col("__mu") - e.getField("v") - slack))
      struct(sp.as("sp"), sn.as("sn"),
        concat(st.getField("out"), array(struct(
          e.getField("s").as("s"), e.getField("v").as("v"),
          sp.as("s_pos"), sn.as("s_neg")))).as("out"))
    })
    collected
      .select(col(keyCol), explode(folded.getField("out")).as("__o"))
      .select(col(keyCol), col("__o.s").as(slotCol),
        col("__o.v").as("value"), col("__o.s_pos"), col("__o.s_neg"),
        (col("__o.s_pos") > threshold || col("__o.s_neg") > threshold)
          .as("alarm"))
  }

  /** Clamped (saturating) running sum per key — inventory balances with
    * a warehouse capacity, credit balances with a floor, token buckets:
    * `bal_t = clamp(bal_{t-1} + v_t, lo, hi)`. The clamp makes the
    * recurrence NON-linear, so no window frame expresses it (unlike a
    * plain cumulative sum); it is the [[cusum]] in-row fold: ONE
    * groupBy(key) shuffle, sort_array + aggregate fold over (slot,
    * value) structs, explode back, hot keys fail loudly at
    * `maxEventsPerKey`. Exact Long arithmetic end to end — the DuckDB
    * recursive-CTE oracle replays the identical integer recurrence.
    *
    * Fold order is (slot, value) lexicographic; rows tied on BOTH are
    * interchangeable (same multiset of outputs), so the result is
    * deterministic cross-engine without a unique sequence column.
    *
    * @return (key, slot, delta, balance) — one row per input event
    */
  def clampedCumsum(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, lo: Long, hi: Long, init: Long,
      maxEventsPerKey: Int = 1 << 20): DataFrame = {
    require(lo <= hi, s"empty clamp range [$lo, $hi]")
    require(init >= lo && init <= hi,
      s"init $init outside the clamp range [$lo, $hi]")
    val collected = df
      .select(col(keyCol),
        struct(col(slotCol).as("s"), col(valCol).cast("long").as("v"))
          .as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__es"))
      .withColumn("__es", when(size(col("__es")) > maxEventsPerKey,
        raise_error(concat(
          lit("clampedCumsum: key "), col(keyCol).cast("string"),
          lit(s" exceeds $maxEventsPerKey rows in one in-row fold; " +
            "pre-aggregate to a coarser slot grain"))))
        .otherwise(col("__es")))
    val outType = ("array<struct<s:" +
      df.select(col(slotCol)).schema.head.dataType.sql +
      ",v:bigint,bal:bigint>>").toLowerCase
    val zero = struct(lit(init).as("bal"), array().cast(outType).as("out"))
    val folded = aggregate(col("__es"), zero, (st, e) => {
      val bal = greatest(lit(lo),
        least(lit(hi), st.getField("bal") + e.getField("v")))
      struct(bal.as("bal"),
        concat(st.getField("out"), array(struct(
          e.getField("s").as("s"), e.getField("v").as("v"),
          bal.as("bal")))).as("out"))
    })
    collected
      .select(col(keyCol), explode(folded.getField("out")).as("__o"))
      .select(col(keyCol), col("__o.s").as(slotCol),
        col("__o.v").as("delta"), col("__o.bal").as("balance"))
  }

  /** Additive seasonal decomposition (STL-lite): value = trend +
    * seasonal + residual over a regular per-key series — the classic
    * monitoring read on daily metric counts (is today's drop seasonal
    * or real?).
    *
    *  - trend: centered moving average over a full `period`-slot
    *    window (RANGE frame on the slot index, so missing slots shrink
    *    the count and the full-window requirement nulls the edge —
    *    a ROWS frame would silently average across gaps);
    *  - seasonal: per (key, slot mod period) mean of the detrended
    *    series, centered to zero mean so trend keeps the level;
    *  - residual: value − trend − seasonal.
    *
    * Plan: ONE per-key window pass (RANGE frame), a (key, phase)
    * aggregate of at most `period` rows per key, a per-key centering
    * aggregate, two broadcast joins back. Series length per key rides
    * the key's partition; nothing is driver-side.
    *
    * FP discipline: trend is a single division of exact integer-frame
    * sums when `valCol` is integral (ship raw); seasonal/residual sum
    * doubles across rows → rounded 6dp, safe because the values are
    * rationals with small non-10-aligned denominators (they cannot
    * land on a 6dp half-grid point — the NOTES boundary argument).
    *
    * @param slotCol a DATE column, one row per (key, slot)
    * @return (key, slot, value, n_frame, trend, seasonal, residual) */
  def decompose(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3 (centered window): $period")
    val half = period / 2
    val base = df.select(col(keyCol), col(slotCol),
      col(valCol).cast("double").as("__v"),
      datediff(col(slotCol), lit("1970-01-01")).as("__di"))
    val wT = Window.partitionBy(keyCol).orderBy(col("__di"))
      .rangeBetween(-half, half)
    // contract guard: one row per (key, slot) — a duplicate slot would
    // silently double-count inside every covering frame. The check
    // rides the SAME partitioning as the trend window (no extra
    // exchange; the zero-width range frame counts exact-slot peers).
    val wDup = Window.partitionBy(keyCol).orderBy(col("__di"))
      .rangeBetween(0, 0)
    val withTrend = base
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("__v", when(col("__dup") > 1, raise_error(concat(
        lit("decompose: duplicate slot for key "),
        col(keyCol).cast("string"),
        lit(" — pre-aggregate to one row per (key, slot)"))))
        .otherwise(col("__v")))
      .drop("__dup")
      .withColumn("__n", count(lit(1)).over(wT))
      .withColumn("trend", when(col("__n") === period,
        sum(col("__v")).over(wT) / col("__n")))
      .withColumn("__phase", pmod(col("__di"), lit(period)))
    val seasRaw = withTrend.filter(col("trend").isNotNull)
      .groupBy(col(keyCol).as("__k"), col("__phase").as("__p"))
      .agg(avg(col("__v") - col("trend")).as("__sraw"))
    val seasCentered = seasRaw
      .groupBy("__k").agg(avg("__sraw").as("__smean"))
      .join(seasRaw, "__k")
      .select(col("__k"), col("__p"),
        (col("__sraw") - col("__smean")).as("__seas"))
    withTrend.join(broadcast(seasCentered),
        col(keyCol) === col("__k") && col("__phase") === col("__p"),
        "left")
      .select(col(keyCol), col(slotCol), col("__v").as("value"),
        col("__n").as("n_frame"), col("trend"),
        round(col("__seas"), 6).as("seasonal"),
        round(col("__v") - col("trend") - col("__seas"), 6)
          .as("residual"))
  }

  /** Rolling z-score anomaly flags: each observation scored against the
    * mean/std of its own key's TRAILING window (current row excluded —
    * an anomaly must not dilute its own baseline), the standard online
    * outlier monitor for metric streams. Exactness contract: the frame
    * sums Σx and Σx² run in DECIMAL (2-dp values square to exact 4-dp)
    * so they are frame-content-exact on any engine; μ, σ, z are then a
    * fixed IEEE sequence over those exact doubles (sqrt correctly
    * rounded) — RAW z-scores hash. Frames with fewer than `minObs`
    * observations or zero variance score null (a constant baseline has
    * no z). One window pass per key; frame state is `window` rows.
    *
    * @return input + (n_frame, z, is_anomaly) */
  def rollingZscore(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, window: Int = 20,
      minObs: Int = 5, k: Double = 3.0): DataFrame = {
    require(window >= 2 && minObs >= 2 && minObs <= window,
      s"need 2 <= minObs <= window, got minObs=$minObs window=$window")
    val money = graft.queries.Exact.Money
    val sq = org.apache.spark.sql.types.DecimalType(38, 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window.toLong, -1)
    val sx = sum(col(valueCol).cast(money)).over(w).cast("double")
    val sxx = sum((col(valueCol).cast(money) * col(valueCol).cast(money))
      .cast(sq)).over(w).cast("double")
    val nf = count(lit(1)).over(w).cast("double")
    val mu = sx / nf
    // guard BEFORE the sqrt: an exactly-zero variance can land a hair
    // negative after the sx·sx double rounding, and engines disagree on
    // sqrt(negative) (NaN vs error)
    val varr = (sxx - sx * sx / nf) / nf
    val z = (col(valueCol) - mu) / sqrt(varr)
    df.withColumn("n_frame", count(lit(1)).over(w))
      .withColumn("z",
        when(nf >= minObs && varr > 0, z).otherwise(lit(null)))
      // non-null flag: unscored rows are "not flagged", and a nullable
      // boolean stringifies differently per engine in the driver's
      // canonicalizer (None vs nan)
      .withColumn("is_anomaly",
        coalesce(when(col("z").isNotNull, abs(col("z")) > k),
          lit(false)))
  }

  /** Holt double exponential smoothing (level + linear trend) per key
    * — the forecasting step after [[resample]]/[[cusum]]'s slot
    * aggregation: `l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}`, initialized `l_1 = x_1,
    * b_1 = 0` (the zero-trend init — deterministic with no second-point
    * special case; the first few slots burn in either way). Forecast at
    * horizon h is the linear extrapolation `l_n + h·b_n`.
    *
    * Shape: the [[emaFeatures]] in-row fold — ONE exchange collapses
    * each key's slot series into a sorted array, the coupled (l, b)
    * recurrence folds inside the row (map-only past the groupBy), keys
    * never interact. Input is expected at SLOT grain (pre-aggregate an
    * event log first — that reduction is the 100 TB step); the fold is
    * guarded by `maxSlotsPerKey` like every in-row fold in the repo.
    *
    * FP discipline: a strictly sequential double chain, the EMA/CUSUM
    * gate class — a DuckDB recursive-CTE oracle replaying the same op
    * order reproduces it bit-for-bit, so outputs ship RAW. Pin α/β to
    * exact binary fractions (0.5, 0.25, …) in cross-engine gates so
    * `1−α` / `1−β` are literal-exact in both engines.
    *
    * @param slotCol integer-ish slot (day number, hour bucket) — the
    *                fold orders by it; duplicates raise (two values in
    *                one slot would make the recurrence order-dependent)
    * @return one row per key: (keyCol, n_slots, level, trend,
    *         fc_1 = level+trend, fc_h = level + horizon·trend) */
  def holtForecast(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, alpha: Double, beta: Double, horizon: Int,
      maxSlotsPerKey: Int = 1 << 20): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(horizon >= 1, s"horizon must be >= 1: $horizon")
    val collected = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
          col(slotCol).cast("long").as("s"),
          col(valCol).cast("double").as("v")))).as("__ss"),
        count(lit(1)).as("__n"))
      // duplicate-slot check on the COLLECTED array (map-only) — a
      // countDistinct in the same agg would plan an Expand, doubling
      // the shuffle for a guard
      .withColumn("__nd",
        size(array_distinct(transform(col("__ss"), e => e.getField("s"))))
          .cast("long"))
      .withColumn("__ss",
        when(col("__n") =!= col("__nd"), raise_error(concat(
          lit("holtForecast: key "), col(keyCol).cast("string"),
          lit(" has duplicate slots — aggregate to slot grain first"))))
          .when(col("__n") > maxSlotsPerKey, raise_error(concat(
            lit("holtForecast: key "), col(keyCol).cast("string"),
            lit(s" exceeds $maxSlotsPerKey slots in one in-row fold"))))
          .otherwise(col("__ss")))
    val zero = struct(
      lit(null).cast("double").as("l"),
      lit(null).cast("double").as("b"))
    val folded = aggregate(col("__ss"), zero, (st, e) => {
      val lNew = e.getField("v") * alpha +
        (st.getField("l") + st.getField("b")) * (1.0 - alpha)
      val bNew = (lNew - st.getField("l")) * beta +
        st.getField("b") * (1.0 - beta)
      struct(
        when(st.getField("l").isNull, e.getField("v"))
          .otherwise(lNew).as("l"),
        when(st.getField("l").isNull, lit(0.0))
          .otherwise(bNew).as("b"))
    })
    collected
      .select(col(keyCol), col("__n").as("n_slots"),
        folded.getField("l").as("level"),
        folded.getField("b").as("trend"))
      .withColumn("fc_1", col("level") + col("trend"))
      .withColumn("fc_h",
        col("level") + lit(horizon.toDouble) * col("trend"))
  }

  /** Inter-arrival burstiness per key — Goh & Barabási's
    * `B = (σ − μ)/(σ + μ)` over the gaps between consecutive events:
    * −1 = metronome (bots, cron), 0 = Poisson, →1 = heavy bursts
    * (humans, incidents). The traffic-shape screen run next to
    * [[timeWeightedAvg]] on the same keyed lead() pass.
    *
    * Exactness: gaps are exact MILLIS (micro diffs div 1000 — B is
    * scale-invariant and the millis grid keeps squares inside the
    * exact bound out to ~35-day gaps, raised loudly past it). The
    * millis grid FLOORS each gap: `mean_gap_ms` is floor-biased by up
    * to 1 ms for gaps that are not whole millis, and a gap under 1 ms
    * would truncate to 0 (indistinguishable from a duplicate, and a
    * key whose gaps are ALL sub-ms would emit a silent 0/0 NaN) — so
    * sub-millisecond gaps raise loudly, same posture as exact ties.
    * Σg and
    * Σg² ride the welchT hi/lo split so squares never leave exact
    * integer space; σ uses the POPULATION variance (n divisor); B is
    * a fixed IEEE chain over exact integers, shipped RAW.
    *
    * Loud degenerates: duplicate (key, ts) raises (a zero gap is
    * indistinguishable from a data bug); keys with fewer than 2 gaps
    * yield NULL burstiness (σ of one gap is 0 by fiat — the sweep-row
    * discipline keeps them visible, not dropped).
    *
    * @return one row per key: (keyCol, n_gaps, mean_gap_ms,
    *         burstiness) */
  def burstiness(df: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"))
    val rows = df.filter(col(tsCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__next", lead(col("__us"), 1).over(w))
    val gap0 = col("__next") - col("__us")
    val gap = when(gap0 === 0, raise_error(concat(lit(
        "TimeSeries.burstiness: duplicate ts for key "),
        col(keyCol).cast("string"))).cast("long"))
      .when(gap0 < 1000, raise_error(concat(lit(
        "TimeSeries.burstiness: sub-millisecond gap for key "),
        col(keyCol).cast("string"), lit(
          " — gaps ride the exact MILLIS grid (a 1-999 micro gap " +
            "truncates to 0 and silently poisons mu/sigma); coarsen " +
            "or de-jitter the timestamps")).cast("long")))
      .when(gap0 > 3037000499000L, raise_error(lit(
        "TimeSeries.burstiness: gap beyond the exact-square bound " +
          "(~35 days) — shard the span")))
      .otherwise(expr("(__next - __us) div 1000"))
    val sq = gap * gap
    val agg = rows.groupBy(col(keyCol))
      .agg(count(col("__next")).as("n_gaps"),
        coalesce(sum(gap), lit(0L)).as("__s"),
        coalesce(sum(shiftright(sq, 32)), lit(0L)).as("__hi"),
        coalesce(sum(sq.bitwiseAND(lit(0xffffffffL))), lit(0L))
          .as("__lo"))
    val B = lit(4294967296L)
    val q = col("__hi").cast(dec) * B.cast(dec) + col("__lo").cast(dec)
    val nD = col("n_gaps").cast(dec)
    // population variance numerator n·Σg² − (Σg)², exact decimal
    val varNum = (nD * q - col("__s").cast(dec) * col("__s").cast(dec))
      .cast("double")
    val nDd = col("n_gaps").cast("double")
    val mu = col("__s").cast("double") / nDd
    val sigma = sqrt(varNum / (nDd * nDd))
    agg.select(col(keyCol), col("n_gaps"),
      when(col("n_gaps") === 0, lit(null).cast("double"))
        .otherwise(mu).as("mean_gap_ms"),
      when(col("n_gaps") < 2, lit(null).cast("double"))
        .otherwise((sigma - mu) / (sigma + mu)).as("burstiness"))
  }

  /** Time-weighted average per key — the right "average value" for a
    * STEP series (a price, a config value, a gauge) where plain AVG
    * over-weights chatty periods: each observation holds until the
    * next one, so `twap = Σ vᵢ·Δtᵢ / ΣΔtᵢ` over the key's span. The
    * last observation carries no duration and is excluded (an open
    * interval has no width — the standard convention; it is still
    * counted in n_obs).
    *
    * Shape: one keyed window (lead over the key's time order — keyed,
    * never global) to durations, then one grouped exact aggregate.
    * Exactness: Δt is exact micros; v scales to exact cents with the
    * welchT magnitude guard; Σ v·Δt is exact DECIMAL(38,0); twap is
    * ONE IEEE division of exact integers — RAW-gateable.
    *
    * Loud degenerates: duplicate (key, ts) raises (which value holds
    * is undefined); keys with a single observation yield NULL twap
    * (no interval — the sweep-row discipline).
    *
    * @return one row per key: (keyCol, n_obs, span_micros, twap) */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val cents0 = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val cents = when(cents0.isNull && col(valueCol).isNotNull,
        raise_error(lit(
          s"TimeSeries.timeWeightedAvg: $valueCol overflows long cents")))
      .when(abs(cents0) > 3037000499L, raise_error(lit(
        "TimeSeries.timeWeightedAvg: |cents| beyond the exact bound")))
      .otherwise(cents0)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"))
    val rows = df
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"),
        cents.as("__c"))
      .withColumn("__next", lead(col("__us"), 1).over(w))
    // the duplicate-ts raise rides the REFERENCED duration input (a
    // both-branches-equal when gets constant-folded away with its
    // guard — found live by the spec)
    val dur = when(col("__next") === col("__us"), raise_error(concat(
        lit("TimeSeries.timeWeightedAvg: duplicate ts for key "),
        col(keyCol).cast("string"))).cast("long"))
      .otherwise(col("__next") - col("__us"))
    rows
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        coalesce(sum(dur), lit(0L)).as("span_micros"),
        sum(dur.cast(dec) * col("__c").cast(dec)).as("__wsum"))
      .select(col(keyCol), col("n_obs"), col("span_micros"),
        // a single-observation key has no interval: NULL, not 0/0
        // (ANSI division would raise)
        when(col("span_micros") === 0, lit(null).cast("double"))
          .otherwise(col("__wsum").cast("double") /
            (col("span_micros").cast("double") * lit(100.0)))
          .as("twap"))
  }

  /** Holt–Winters ADDITIVE-SEASONAL smoothing per key — the seasonal
    * completion of [[holtForecast]] for slot series with a known cycle
    * (day-of-week order volume, hour-of-day traffic):
    * `l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})`,
    * `b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`,
    * `s_t = γ(x_t − l_t) + (1−γ)s_{t−m}`, forecast
    * `x̂_{n+h} = l_n + h·b_n + s_{n−m+1+((h−1) mod m)}`.
    *
    * Init (deterministic, division-free): the first m slots burn in as
    * `l_t = x_t, b_t = 0, s_t = 0` — no seasonal means, no
    * second-point special case; γ folds real seasonality in from the
    * second cycle on (fewer than m+1 slots raises — everything would
    * be burn-in).
    *
    * Shape: the [[holtForecast]] in-row fold with an m-slot rolling
    * seasonal buffer in the fold state (O(m) array work per step, m
    * bounded by contract); ONE exchange per key, map-only past it.
    *
    * FP discipline: a strictly sequential double chain — the
    * recursive-CTE oracle replays the identical op order, so outputs
    * ship RAW; pin α/β/γ to exact binary fractions in cross-engine
    * gates.
    *
    * @param period the season length m (slots per cycle), >= 2
    * @return one row per key: (keyCol, n_slots, level, trend, fc_1,
    *         fc_h) — forecasts include the seasonal term */
  def holtWintersForecast(df: DataFrame, keyCol: String, slotCol: String,
      valCol: String, alpha: Double, beta: Double, gamma: Double,
      period: Int, horizon: Int,
      maxSlotsPerKey: Int = 1 << 20): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0,1]: $gamma")
    require(period >= 2, s"period must be >= 2: $period")
    require(horizon >= 1, s"horizon must be >= 1: $horizon")
    val m = period
    val collected = df
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(
          col(slotCol).cast("long").as("s"),
          col(valCol).cast("double").as("v")))).as("__ss"),
        count(lit(1)).as("__n"))
      .withColumn("__nd",
        size(array_distinct(transform(col("__ss"), e => e.getField("s"))))
          .cast("long"))
      .withColumn("__ss",
        when(col("__n") =!= col("__nd"), raise_error(concat(
          lit("holtWintersForecast: key "), col(keyCol).cast("string"),
          lit(" has duplicate slots — aggregate to slot grain first"))))
          .when(col("__n") <= m, raise_error(concat(
            lit("holtWintersForecast: key "), col(keyCol).cast("string"),
            lit(s" has <= $m slots — the whole series is burn-in; " +
              "need more than one season"))))
          .when(col("__n") > maxSlotsPerKey, raise_error(concat(
            lit("holtWintersForecast: key "), col(keyCol).cast("string"),
            lit(s" exceeds $maxSlotsPerKey slots in one in-row fold"))))
          .otherwise(col("__ss")))
    val zero = struct(
      lit(null).cast("double").as("l"),
      lit(null).cast("double").as("b"),
      array().cast("array<double>").as("buf"))
    val folded = aggregate(col("__ss"), zero, (st, e) => {
      val burn = size(st.getField("buf")) < m
      val sm = when(burn, lit(0.0))
        .otherwise(element_at(st.getField("buf"), 1))
      val x = e.getField("v")
      val lNew = when(burn, x)
        .otherwise((x - sm) * alpha +
          (st.getField("l") + st.getField("b")) * (1.0 - alpha))
      val bNew = when(burn, lit(0.0))
        .otherwise((lNew - st.getField("l")) * beta +
          st.getField("b") * (1.0 - beta))
      val sNew = when(burn, lit(0.0))
        .otherwise((x - lNew) * gamma + sm * (1.0 - gamma))
      val trimmed = when(size(st.getField("buf")) === m,
        slice(st.getField("buf"), 2, m - 1))
        .otherwise(st.getField("buf"))
      struct(lNew.as("l"), bNew.as("b"),
        concat(trimmed, array(sNew)).as("buf"))
    })
    val sIdx = ((horizon - 1) % m) + 1
    collected
      .select(col(keyCol), col("__n").as("n_slots"),
        folded.getField("l").as("level"),
        folded.getField("b").as("trend"),
        folded.getField("buf").as("__buf"))
      .withColumn("fc_1", col("level") + col("trend") +
        element_at(col("__buf"), 1))
      .withColumn("fc_h", col("level") +
        lit(horizon.toDouble) * col("trend") +
        element_at(col("__buf"), sIdx))
      .drop("__buf")
  }

  /** Lagged cross-correlation between two metrics on one slot-grain
    * series — "does click volume LEAD purchase volume, and by how many
    * days": Pearson r between `x_t` and `y_{t+lag}` for each lag in
    * `0..maxLag`, the lead-lag screen run before any causal read of
    * paired operational metrics.
    *
    * Shape: lags explode from a `sequence` (maxLag+1 rows per slot),
    * then ONE equi-join on the shifted slot key and one grouped
    * partial-agg to per-lag exact moments — no window, no per-lag
    * rescan; the series is slot-grain (loud duplicate-slot guard), so
    * every table is grid-sized and data-size-independent.
    *
    * Exactness: values are exact longs (counts, pre-scaled cents) with
    * the corrMatrix |v| ≤ 3,037,000,499 bound raised in-plan so every
    * square stays an exact DECIMAL(38,0) product; r is the textbook
    * `(nΣxy − ΣxΣy) / (√(nΣx² − (Σx)²)·√(nΣy² − (Σy)²))` — one fixed
    * IEEE chain over exact integers, shipped RAW. A zero-variance lag
    * yields NULL r (a sweep row must not kill the sweep — the
    * welchSweep discipline); lags with fewer than 2 overlapping slots
    * are dropped.
    *
    * @return one row per lag: (lag, n, r) */
  def crossCorr(df: DataFrame, slotCol: String, xCol: String,
      yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    def bounded(c: org.apache.spark.sql.Column, name: String) =
      when(abs(c) > 3037000499L, raise_error(lit(
        s"TimeSeries.crossCorr: |$name| beyond the exact-square bound")))
        .otherwise(c)
    val pts = df.filter(col(slotCol).isNotNull)
      .select(col(slotCol).cast("long").as("__t"),
        bounded(col(xCol).cast("long"), xCol).as("__x"),
        bounded(col(yCol).cast("long"), yCol).as("__y"))
    val meta = pts.groupBy(col("__t")).agg(count(lit(1)).as("__k"))
      .agg(coalesce(max("__k"), lit(0L)).as("__maxk"))
    // guard rides the exploded left side's referenced __x (the
    // pruned-guard lesson)
    val left = pts.crossJoin(broadcast(meta))
      .select(col("__t"),
        when(col("__maxk") > 1, raise_error(lit(
          "TimeSeries.crossCorr: duplicate slot — aggregate to slot " +
            "grain first")))
          .otherwise(col("__x")).as("__x"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
      .withColumn("__key", col("__t") + col("lag"))
    val right = pts.select(col("__t").as("__t2"), col("__y"))
    val m = left.join(right, col("__key") === col("__t2"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__y").cast(dec) * col("__y").cast(dec)).as("__syy"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"))
      .filter(col("n") >= 2)
    val nD = col("n").cast(dec)
    val num = nD * col("__sxy") - col("__sx") * col("__sy")
    val dx = nD * col("__sxx") - col("__sx") * col("__sx")
    val dy = nD * col("__syy") - col("__sy") * col("__sy")
    m.select(col("lag"), col("n"),
      when(dx <= 0 || dy <= 0, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          (sqrt(dx.cast("double")) * sqrt(dy.cast("double"))))
        .as("r"))
  }

  /** Mann–Kendall trend test + Theil–Sen slope over a pre-aggregated
    * series — the nonparametric "is this metric drifting, and how
    * fast" monitor (daily ingest volume, daily dedup rate): S counts
    * concordant-minus-discordant time pairs, the tie-corrected z its
    * significance, and the Sen slope is the MEDIAN pairwise slope — a
    * robust rate no single outlier day can move (the regression-line
    * alternative breaks on one bad day).
    *
    * PRECONDITION (loud): the input is a SLOT-GRAIN series (one row
    * per slot — run the groupBy first), at most `maxPoints` rows. The
    * pair table is grid², DATA-SIZE-INDEPENDENT at any corpus scale
    * (the whole point: 100 TB of events still collapse to the same
    * day grid). Pairs come from one broadcast-nested-loop self-join
    * of the bounded grid; the guards ride the broadcast side's
    * referenced value column so they fire while it is built.
    *
    * Exactness: values are exact longs (counts, pre-scaled cents); S
    * and the tie sums are exact integers; var_s is one DECIMAL→double
    * cast ÷ 18.0; z is a fixed IEEE chain (sqrt is IEEE-exact),
    * shipped RAW. Each pairwise slope is ONE long-diff division —
    * bit-identical cross-engine — and the median is selected (not
    * averaged across engines) by exact pair ranks off the
    * distinct-slope collapse; an even pair count averages the two
    * middle slopes (one add + one halving).
    *
    * @param bucket maps a slope to its rank-phase bucket id
    * @return one row: (n, n_pairs, s, var_s, z, sen_slope) */
  def mannKendallTrend(df: DataFrame, slotCol: String, valueCol: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxPoints: Int = 100000): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val pts = df.filter(col(slotCol).isNotNull && col(valueCol).isNotNull)
      .select(col(slotCol).cast("long").as("__t"),
        col(valueCol).cast("long").as("__v"))
    val meta = pts.groupBy(col("__t")).agg(count(lit(1)).as("__k"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("__n"),
        coalesce(max("__k"), lit(0L)).as("__maxk"))
    // guards ride the broadcast side's referenced __v2 (the RankCorr
    // lesson: a raise on an unreferenced column gets column-pruned)
    val right = pts.crossJoin(broadcast(meta))
      .select(col("__t").as("__t2"),
        when(col("__maxk") > 1, raise_error(lit(
          "TimeSeries.mannKendallTrend: duplicate slot — aggregate " +
            "to slot grain first")))
          .when(col("__n") < 3, raise_error(lit(
            "TimeSeries.mannKendallTrend: need at least 3 points")))
          .when(col("__n") > maxPoints, raise_error(concat(
            lit(s"TimeSeries.mannKendallTrend: series beyond " +
              s"$maxPoints slots (the pair table is grid²) — got "),
            col("__n").cast("string"))))
          .otherwise(col("__v")).as("__v2"))
    val pairs = pts.join(broadcast(right), col("__t2") > col("__t"))
    val sAgg = pairs.agg(
      coalesce(sum(when(col("__v2") > col("__v"), 1L)
        .when(col("__v2") < col("__v"), -1L).otherwise(0L)), lit(0L))
        .as("s"),
      count(lit(1)).as("n_pairs"))
    val nRow = pts.agg(count(lit(1)).as("n"))
    val tieAgg = pts.groupBy(col("__v")).agg(count(lit(1)).as("__m"))
      .agg(coalesce(sum(col("__m").cast(dec) * (col("__m") - 1).cast(dec)
        * (lit(2L) * col("__m") + 5L).cast(dec)), lit(0L).cast(dec))
        .as("__tie"))
    // median pairwise slope: distinct-slope collapse + two-phase cum
    // ranks (the exact-quantile recipe — never a global sort of pairs)
    val slopes = pairs
      .select(((col("__v2") - col("__v")).cast("double") /
        (col("__t2") - col("__t")).cast("double")).as("__sl"))
      .groupBy(col("__sl")).agg(count(lit(1)).as("__c"))
      .withColumn("__bk", bucket(col("__sl")))
    val wOff = Window.partitionBy(Bounded.constPart(col("__tc")))
      .orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = slopes.groupBy(col("__bk")).agg(sum("__c").as("__tc"))
      .withColumn("__oc", coalesce(sum(col("__tc")).over(wOff), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__oc"))
    val wIn = Window.partitionBy(col("__bk")).orderBy(col("__sl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = slopes.join(broadcast(offs), col("__bk") <=> col("__bk2"))
      .withColumn("__hi", col("__oc") + sum(col("__c")).over(wIn))
      .withColumn("__lo", col("__hi") - col("__c") + 1L)
    val med = ranked.crossJoin(broadcast(sAgg.select(
        expr("(n_pairs + 1) div 2").as("__m1"),
        expr("(n_pairs + 2) div 2").as("__m2"))))
      .agg(
        min(when(col("__lo") <= col("__m1") && col("__m1") <= col("__hi"),
          col("__sl"))).as("__s1"),
        min(when(col("__lo") <= col("__m2") && col("__m2") <= col("__hi"),
          col("__sl"))).as("__s2"))
    val joined = nRow.crossJoin(sAgg).crossJoin(tieAgg).crossJoin(med)
    val nD = col("n").cast("double")
    val varS = (col("n").cast(dec) * (col("n") - 1).cast(dec) *
      (lit(2L) * col("n") + 5L).cast(dec) - col("__tie"))
      .cast("double") / lit(18.0)
    val sD = col("s").cast("double")
    joined.select(col("n"), col("n_pairs"), col("s"),
      varS.as("var_s"),
      when(varS <= 0.0, raise_error(lit(
        "TimeSeries.mannKendallTrend: zero variance — every value " +
          "tied")))
        .when(col("s") > 0, (sD - lit(1.0)) / sqrt(varS))
        .when(col("s") < 0, (sD + lit(1.0)) / sqrt(varS))
        .otherwise(lit(0.0)).as("z"),
      ((col("__s1") + col("__s2")) / lit(2.0)).as("sen_slope"))
  }

  /** Hampel outlier screen — the robust per-point anomaly filter a
    * metric-quality monitor runs where [[rollingZscore]] would be
    * dragged by the outliers themselves (mean/stddev break down under
    * the very spikes being hunted; median/MAD have a 50% breakdown
    * point): each point is compared against the MEDIAN of its
    * ±`halfWin` ROWS window, flagged when `|x − med| > k · MAD` with
    * MAD the median absolute deviation from that same window median
    * (plain MAD — no 1.4826 Gaussian consistency factor; fold it into
    * `k` if normal-calibrated thresholds are wanted).
    *
    * Shape: ONE collect_list window per key (window arrays are
    * `2·halfWin+1` elements — constant per row), median and MAD via
    * in-array sorts, no second pass, no self-join. Exactness: medians
    * pick elements or average two (one IEEE add/divide), so every
    * output is a fixed per-row chain — raw-hashable.
    *
    * Loud degenerates: NULL value or order rows raise (a silent drop
    * would shift every neighbor's window).
    *
    * @return input rows + (med, mad, is_outlier) */
  def hampel(df: DataFrame, keyCol: String, orderCols: Seq[String],
      valueCol: String, halfWin: Int = 3, k: Double = 3.0): DataFrame = {
    require(halfWin >= 1 && halfWin <= 100,
      s"hampel: halfWin must be in [1, 100]: $halfWin")
    require(k > 0, s"hampel: k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-halfWin, halfWin)
    def medOf(arr: org.apache.spark.sql.Column) = {
      val n = size(arr)
      // 1-based middles: odd picks one, even averages the two (the
      // /2 divisions are exact for their parities, so the int casts
      // never truncate)
      when(n % 2 === 1,
        element_at(arr, ((n + 1) / 2).cast("int")).cast("double"))
        .otherwise((element_at(arr, (n / 2).cast("int")).cast("double") +
          element_at(arr, (n / 2).cast("int") + 1).cast("double")) / 2.0)
    }
    val guarded = df.withColumn("__v",
      when(col(valueCol).isNull ||
        orderCols.map(c => col(c).isNull).reduce(_ || _),
        raise_error(lit(
          "TimeSeries.hampel: NULL value/order row — a silent drop " +
            "would shift every neighbor's window; filter explicitly")))
        .otherwise(col(valueCol).cast("double")))
    val withArr = guarded
      .withColumn("__arr", sort_array(collect_list(col("__v")).over(w)))
      .withColumn("med", medOf(col("__arr")))
      .withColumn("mad", medOf(sort_array(
        transform(col("__arr"), x => abs(x - col("med"))))))
    withArr
      .withColumn("is_outlier", abs(col("__v") - col("med")) >
        lit(k) * col("mad"))
      .drop("__arr", "__v")
  }

  /** Durbin–Watson statistic per group — first-order residual
    * autocorrelation of the per-group OLS fit ([[autocorr]] tests the
    * raw series; this tests what a LINEAR model leaves behind — the
    * standard "is a trend-line fit hiding serial structure" readout
    * next to [[mannKendallTrend]]): with x = the 1..n within-group
    * rank of `orderCols` and integer `valueCol`,
    * `DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²` over the OLS residuals.
    *
    * Exactness: the residuals are scaled by `n·den` (den = n·Σx² −
    * (Σx)², the slope denominator), making every scaled residual
    * `n·den·y_t − den·Σy + bNum·Σx − n·bNum·x_t` an EXACT integer
    * (the scale cancels in the ratio) — DW is ONE IEEE division of
    * exact DECIMAL(38,0) sums, shipped RAW. The price is headroom:
    * scaled residuals grow ~n³·x·y, so groups beyond `maxGroupRows`
    * raise loudly (shard or pre-aggregate) instead of silently
    * overflowing the decimal; a residual or square-sum that STILL
    * overflows (|y| itself too large for the group size) raises on
    * the NULL decimal rather than letting sum() silently skip it.
    *
    * Loud degenerates: a group smaller than 3 rows, a perfect fit
    * (Σe² = 0 — DW is 0/0), NULL value/order rows.
    *
    * @return one row per group: (groupCol, n, dw) — DW in [0, 4],
    *         2 ≈ no autocorrelation */
  def durbinWatson(df: DataFrame, groupCol: String,
      orderCols: Seq[String], valueCol: String,
      maxGroupRows: Int = 1000): DataFrame = {
    require(orderCols.nonEmpty, "durbinWatson: need order columns")
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val wo = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(col): _*)
    val base = df.select(col(groupCol).as("__g"),
        when(col(valueCol).isNull ||
          orderCols.map(c => col(c).isNull).reduce(_ || _),
          raise_error(lit(
            "TimeSeries.durbinWatson: NULL value/order row — filter " +
              "explicitly")))
          .otherwise(col(valueCol).cast("long")).as("__y"),
        row_number().over(wo).cast("long").as("__x"))
    val sums = base.groupBy(col("__g").as("__sg"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x").cast(dec)).as("__sx"),
        sum(col("__y").cast(dec)).as("__sy"),
        sum(col("__x").cast(dec) * col("__x").cast(dec)).as("__sxx"),
        sum(col("__x").cast(dec) * col("__y").cast(dec)).as("__sxy"))
      .select(col("__sg"),
        when(col("__n") < 3, raise_error(lit(
          "TimeSeries.durbinWatson: group smaller than 3 rows — DW " +
            "needs at least 2 residual transitions")))
          .when(col("__n") > maxGroupRows, raise_error(lit(
            s"TimeSeries.durbinWatson: group beyond $maxGroupRows " +
              "rows — the exact scaled residuals would overflow " +
              "DECIMAL(38); shard or pre-aggregate")))
          .otherwise(col("__n")).cast(dec).as("__nn"),
        col("__sx"), col("__sy"), col("__sxx"), col("__sxy"))
    val den = col("__nn") * col("__sxx") - col("__sx") * col("__sx")
    val bNum = col("__nn") * col("__sxy") - col("__sx") * col("__sy")
    // the row-count guard above bounds n but NOT |y|: a huge integer
    // value (say cents of a large price) overflows the ~n⁵·y scaled
    // residual to a NULL decimal (ANSI off), which sum() would then
    // SILENTLY SKIP — raise on the NULL instead (fires exactly when
    // the decimal actually overflowed, no conservative |y| cap needed)
    val rRaw = col("__nn") * den * col("__y").cast(dec) -
      den * col("__sy") + bNum * col("__sx") -
      col("__nn") * bNum * col("__x").cast(dec)
    val joined = base.join(sums, col("__g") === col("__sg"))
      .select(col("__g"), col("__x"), col("__nn"),
        when(rRaw.isNull, raise_error(lit(
          "TimeSeries.durbinWatson: scaled residual overflowed " +
            "DECIMAL(38) — |value| too large for this group size; " +
            "rescale the series or shard the group")))
          .otherwise(rRaw).as("__r"))
    val wl = Window.partitionBy(col("__g")).orderBy(col("__x"))
    val withLag = joined
      .withColumn("__rp", lag(col("__r"), 1).over(wl))
    // guard the SQUARES per row, not just the whole sum: with ANSI
    // off, one row's __r*__r overflowing DECIMAL(38) to NULL would be
    // SILENTLY SKIPPED by sum() while other rows still contribute —
    // a non-NULL but wrong statistic. Raise at the row that overflows.
    val rSq = col("__r") * col("__r")
    val rSqG = when(rSq.isNull, raise_error(lit(
      "TimeSeries.durbinWatson: a residual square overflowed " +
        "DECIMAL(38) — |value| too large for this group size; " +
        "rescale the series or shard the group"))).otherwise(rSq)
    val dDiff = col("__r") - col("__rp")
    val dSq = dDiff * dDiff
    val dSqG = when(dSq.isNull, raise_error(lit(
      "TimeSeries.durbinWatson: a residual-difference square " +
        "overflowed DECIMAL(38) — |value| too large for this group " +
        "size; rescale the series or shard the group"))).otherwise(dSq)
    withLag.groupBy(col("__g").as(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__rp").isNotNull, dSqG)).as("__num"),
        sum(rSqG).as("__den"))
      .select(col(groupCol), col("n"),
        when(col("__num").isNull || col("__den").isNull, raise_error(lit(
          "TimeSeries.durbinWatson: residual square sum overflowed " +
            "DECIMAL(38) — |value| too large for this group size; " +
            "rescale the series or shard the group")))
          .when(col("__den") === 0, raise_error(lit(
          "TimeSeries.durbinWatson: perfect linear fit — every " +
            "residual is 0 and DW is 0/0")))
          .otherwise(col("__num").cast("double") /
            col("__den").cast("double")).as("dw"))
  }
}
