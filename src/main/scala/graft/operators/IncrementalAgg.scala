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
  * Min/max are deliberately ABSENT — they are not self-maintainable
  * under deletes (removing the current minimum needs a re-scan of the
  * group; that is the classic IVM caveat, stated here rather than
  * silently mis-maintained).
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
  * are touched. Groups vanishing to zero rows drop out.
  */
object IncrementalAgg {

  /** Aggregate a raw batch into rollup form: (groups…, n, <m>_sum as
    * exact decimal) for each measure column. Use once to seed the
    * rollup, and inside [[applyDelta]] for the delta batch. */
  def rollup(df: DataFrame, groupCols: Seq[String],
      measureCols: Seq[String], opCol: Option[String] = None): DataFrame = {
    val op = opCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val aggs = sum(op).as("n") +: measureCols.map(m =>
      sum(op.cast(graft.queries.Exact.Money) *
        col(m).cast(graft.queries.Exact.Money)).as(s"${m}_sum"))
    df.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

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
    base.join(renamedD, groupCols, "full_outer")
      .select((groupCols.map(col) :+
        (coalesce(col("n"), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
          .as("n")) ++
        sumCols.map(c =>
          (coalesce(col(c), lit(0).cast(graft.queries.Exact.Money)) +
            coalesce(col(s"__d_$c"),
              lit(0).cast(graft.queries.Exact.Money))).as(c)): _*)
      .filter(col("n") > 0)
  }
}
