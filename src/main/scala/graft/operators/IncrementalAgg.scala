package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (incremental view maintenance for
  * the distributive aggregates): keep a per-group rollup current under a
  * CDC delta batch by merging a DELTA AGGREGATE — never re-scanning the
  * base data. At 100 TB this is the difference between an O(delta)
  * nightly refresh and an O(corpus) one.
  *
  * Deltas arrive as signed rows (`op = +1` insert, `-1` delete — an
  * update is a delete + insert, the [[Cdc]] convention). Count and sum
  * are self-maintainable: `n' = n + Σop`, `sum' = sum + Σ(op·x)`.
  *
  * Min/max are NOT self-maintainable under deletes (removing the current
  * minimum needs the group's remaining values — the classic IVM caveat).
  * [[applyDeltaWithMinMax]] covers them honestly with a two-tier refresh:
  * groups whose deletes cannot touch the current bound (interior deletes,
  * insert-only groups) merge distributively; only the AFFECTED groups —
  * a delete ≤ current min or ≥ current max — re-derive their bounds from
  * the base DATA, semi-join-pruned to exactly those groups. The refresh
  * stays O(delta + affected-group rows), not O(corpus).
  *
  * Exactness discipline ([[graft.queries.Exact]]): measures fold in
  * DECIMAL, so the merged aggregate is bit-identical to a from-scratch
  * recomputation in ANY engine regardless of batch order — the gate
  * proves `base ⊕ delta = recompute(base ∪ delta)` exactly, which is
  * the property that lets refreshes chain indefinitely without drift.
  *
  * Scale shape: the delta aggregates with map-side partials (shuffle =
  * groups × partial states), then one full-outer join against the
  * rollup keyed on the group — the base TABLE rows, not the base DATA,
  * are touched (except the affected-group tier above). Groups vanishing
  * to zero rows drop out. Group keys join NULL-SAFELY: a null group key
  * is one group, not a row-per-refresh leak.
  */
object IncrementalAgg {

  /** Aggregate a raw batch into rollup form: (groups…, n, <m>_sum as
    * exact decimal, and with `withMinMax` also <m>_min/<m>_max) for each
    * measure column. Use once to seed the rollup, and inside
    * [[applyDelta]] for the delta batch. Min/max are taken over ALL rows
    * (seed batches are inserts); signed deltas split ins/del internally
    * in [[applyDeltaWithMinMax]]. */
  def rollup(df: DataFrame, groupCols: Seq[String],
      measureCols: Seq[String], opCol: Option[String] = None,
      withMinMax: Boolean = false): DataFrame = {
    val op = opCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val aggs = (sum(op).as("n") +: measureCols.map(m =>
      sum(op.cast(graft.queries.Exact.Money) *
        col(m).cast(graft.queries.Exact.Money)).as(s"${m}_sum"))) ++
      (if (withMinMax) measureCols.flatMap(m => Seq(
        min(col(m)).as(s"${m}_min"), max(col(m)).as(s"${m}_max")))
       else Seq.empty)
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Null-safe full outer join on `keys`: the right side's keys are
    * renamed before the join (a self-compare is legal), matched with
    * `<=>`, and coalesced back into the key names — so a null group key
    * present on both sides merges into ONE row. Plain
    * `join(_, keys, "full_outer")` would split it into two forever. */
  private def outerMerge(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    val r = keys.foldLeft(right) {
      (d, k) => d.withColumnRenamed(k, s"__r_$k") }
    val cond = keys.map(k => col(k) <=> col(s"__r_$k"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val rightRest = right.columns.filterNot(keys.contains).toSeq
    left.join(r, cond, "full_outer")
      .select(keys.map(k => coalesce(col(k), col(s"__r_$k")).as(k)) ++
        left.columns.filterNot(keys.contains).map(col) ++
        rightRest.map(col): _*)
  }

  private def zeroMoney = lit(0).cast(graft.queries.Exact.Money)

  /** Merge a signed delta batch into an existing rollup. `delta` carries
    * the group columns, `op` (+1/-1), and the raw measure columns;
    * `base` is a [[rollup]] output. Returns the refreshed rollup (same
    * schema as `base`); groups whose count reaches zero disappear. */
  def applyDelta(base: DataFrame, delta: DataFrame, groupCols: Seq[String],
      measureCols: Seq[String], opCol: String = "op"): DataFrame = {
    val d = rollup(delta, groupCols, measureCols, opCol = Some(opCol))
    val sumCols = measureCols.map(m => s"${m}_sum")
    val renamedD = (("n" +: sumCols) foldLeft d) {
      case (df, c) => df.withColumnRenamed(c, s"__d_$c")
    }
    outerMerge(base, renamedD, groupCols)
      .select((groupCols.map(col) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
          .as("n")) ++
        sumCols.map(c =>
          (coalesce(col(c), zeroMoney) + coalesce(col(s"__d_$c"), zeroMoney))
            .as(c)): _*)
      .filter(col("n") > 0)
  }

  /** [[applyDelta]] plus min/max maintenance. `base` is a
    * `rollup(withMinMax = true)` output; `baseData` is the PRE-delta raw
    * base table (only affected groups of it are ever read). Deletes must
    * refer to rows present in the base multiset (the CDC contract).
    *
    * Tiering: per group, `ins_min/ins_max/del_min/del_max` come out of
    * the one delta aggregate. A group is AFFECTED iff some delete could
    * displace a current bound (`del_min <= m_min` or `del_max >= m_max`
    * for any measure). Unaffected groups merge:
    * `min' = least(m_min, ins_min)` (interior deletes can't move a
    * bound). Affected groups re-derive bounds from the net multiset
    * `baseData ∪ delta` restricted to those groups — value-level counts
    * so duplicate bound values survive a single delete correctly. */
  def applyDeltaWithMinMax(baseData: DataFrame, base: DataFrame,
      delta: DataFrame, groupCols: Seq[String], measureCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val op = col(opCol).cast("long")
    val sumCols = measureCols.map(m => s"${m}_sum")

    // one pass over the delta: signed n/sums + ins/del bounds per measure
    val dAggs = (sum(op).as("__d_n") +: measureCols.map(m =>
      sum(op.cast(graft.queries.Exact.Money) *
        col(m).cast(graft.queries.Exact.Money)).as(s"__d_${m}_sum"))) ++
      measureCols.flatMap(m => Seq(
        min(when(op > 0, col(m))).as(s"__ins_min_$m"),
        max(when(op > 0, col(m))).as(s"__ins_max_$m"),
        min(when(op < 0, col(m))).as(s"__del_min_$m"),
        max(when(op < 0, col(m))).as(s"__del_max_$m")))
    val d = delta.groupBy(groupCols.map(col): _*)
      .agg(dAggs.head, dAggs.tail: _*)

    val affected = measureCols.map(m =>
        coalesce(col(s"__del_min_$m") <= col(s"${m}_min"), lit(false)) ||
        coalesce(col(s"__del_max_$m") >= col(s"${m}_max"), lit(false)))
      .reduce(_ || _)
    val merged = outerMerge(base, d, groupCols)
      .withColumn("__affected", affected)

    // re-derive tier: net value-level multiset of (base ∪ delta) for the
    // affected groups only — the semi join prunes the base scan to them
    val affKeys = merged.filter(col("__affected"))
      .select(groupCols.map(col): _*).distinct()
    def prune(df: DataFrame): DataFrame = {
      val r = groupCols.foldLeft(affKeys) {
        (x, k) => x.withColumnRenamed(k, s"__a_$k") }
      df.join(broadcast(r),
        groupCols.map(k => col(k) <=> col(s"__a_$k")).reduce(_ && _),
        "left_semi")
    }
    val rederived = measureCols.map { m =>
      val vals = prune(baseData)
        .select(groupCols.map(col) :+ col(m).as("__v") :+
          lit(1L).as("__c"): _*)
        .unionByName(prune(delta)
          .select(groupCols.map(col) :+ col(m).as("__v") :+
            op.as("__c"): _*))
      vals.groupBy((groupCols.map(col) :+ col("__v")): _*)
        .agg(sum(col("__c")).as("__net"))
        .filter(col("__net") > 0 && col("__v").isNotNull)
        .groupBy(groupCols.map(col): _*)
        .agg(min(col("__v")).as(s"__re_min_$m"),
          max(col("__v")).as(s"__re_max_$m"))
    }.reduce((a, b) => outerMerge(a, b, groupCols))

    outerMerge(merged, rederived, groupCols)
      .select((groupCols.map(col) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
          .as("n")) ++
        measureCols.map(m =>
          (coalesce(col(s"${m}_sum"), zeroMoney) +
            coalesce(col(s"__d_${m}_sum"), zeroMoney)).as(s"${m}_sum")) ++
        measureCols.flatMap(m => Seq(
          when(col("__affected"), col(s"__re_min_$m"))
            .otherwise(least(col(s"${m}_min"), col(s"__ins_min_$m")))
            .as(s"${m}_min"),
          when(col("__affected"), col(s"__re_max_$m"))
            .otherwise(greatest(col(s"${m}_max"), col(s"__ins_max_$m")))
            .as(s"${m}_max"))): _*)
      .filter(col("n") > 0)
  }

  // ---- COUNT(DISTINCT) maintenance -------------------------------------
  // The auxiliary state is the (group, value) MULTIPLICITY table — the
  // textbook counting solution for duplicate-sensitive aggregates: a
  // distinct value survives while its multiplicity is positive, so
  // n_distinct per group is simply the state's row count. Null values
  // are excluded (COUNT(DISTINCT) semantics).

  /** Seed the distinct-maintenance state from a raw batch (or fold a
    * signed batch when `opCol` is set): (groups…, valueCol, m). */
  def distinctState(df: DataFrame, groupCols: Seq[String],
      valueCol: String, opCol: Option[String] = None): DataFrame = {
    val op = opCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(sum(op).as("m"))
      .filter(col("m") =!= 0)
  }

  /** Fold a signed delta into the multiplicity state — the
    * [[IncrementalJoin.applyDelta]] touched-rows discipline: the net
    * delta per (group, value) broadcasts, the untouched state majority
    * passes through MAP-ONLY (anti join), only touched keys fold.
    * Deletes driving a multiplicity negative (a value the state does
    * not hold) raise in-plan. O(|state| scan + |Δ|), no state-wide
    * shuffle. */
  def applyDistinctDelta(state: DataFrame, delta: DataFrame,
      groupCols: Seq[String], valueCol: String,
      opCol: String = "op"): DataFrame = {
    val keys = groupCols :+ valueCol
    val net = distinctState(delta, groupCols, valueCol, Some(opCol))
      .withColumnRenamed("m", "__dm")
    val netKeyed = net.select(
      keys.map(k => col(k).as(s"__d_$k")) :+ col("__dm"): _*)
    val cond = keys.map(k => col(k) <=> col(s"__d_$k")).reduce(_ && _)
    val untouched = state.join(broadcast(netKeyed), cond, "left_anti")
    val touched = state.join(broadcast(netKeyed), cond, "left_semi")
    val folded = touched.join(netKeyed, cond, "full_outer")
      .select(keys.map(k => coalesce(col(k), col(s"__d_$k")).as(k)) :+
        (coalesce(col("m"), lit(0L)) + coalesce(col("__dm"), lit(0L)))
          .as("m"): _*)
      .withColumn("m",
        when(col("m") < 0, raise_error(lit(
          "incremental distinct: delta deletes a value the state does " +
            "not hold"))).otherwise(col("m")))
      .filter(col("m") > 0)
    untouched.unionByName(folded)
  }

  /** Read side: per-group exact distinct count from the state. */
  def distinctCounts(state: DataFrame,
      groupCols: Seq[String]): DataFrame =
    state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_distinct"), sum("m").as("n_rows"))
}
