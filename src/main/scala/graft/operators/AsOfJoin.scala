package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2B E12): for each left row, attach the latest right
  * row with `right.ts <= left.ts` within the same key.
  *
  * Implementation is the union-merge formulation, not a range join:
  * union both sides tagged, sort per key by (ts, side) and carry the last
  * seen right timestamp forward with `last(_, ignoreNulls)` over an
  * unbounded-preceding frame. Cost is ONE shuffle of |L|+|R| rows keyed by
  * the join key — at 100 TB this beats any range-join/backward-scan
  * formulation (which materializes candidate pairs) and never explodes:
  * it is the standard distributed as-of technique (same shape DuckDB's
  * ASOF JOIN uses per-thread after partitioning).
  *
  * Ties (`right.ts == left.ts`): the right row sorts first, so equality
  * matches — same inclusive semantics as DuckDB's `ON l.ts >= r.ts`.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     build side (events to look up "most recent prior")
    * @param key       equi-key column name present on both sides
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param carry     columns of `right` to carry onto matching left rows
    *                  (carried values come from the latest prior right row)
    * @param tolerance optional max lookback (e.g. "1 hour"): matches older
    *                  than `leftTs - tolerance` become null, like DuckDB's
    *                  `ASOF ... WITHIN` / pandas `merge_asof(tolerance=)`
    * @return `left` columns + carried columns (null when no prior right row)
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, carry: Seq[String],
      tolerance: Option[String] = None): DataFrame = {
    val leftCols = left.columns
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1)) // probes sort after build rows at equal ts
    val rTagged0 = right
      .select((key +: rightTs +: carry).distinct.map(col): _*)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    // align schemas for the union
    val allCols = (lTagged.columns ++ rTagged0.columns).distinct
    def conform(df: DataFrame): DataFrame =
      df.select(allCols.toIndexedSeq.map(c =>
        if (df.columns.contains(c)) col(c) else lit(null).as(c)): _*)

    val unioned = conform(lTagged).unionByName(conform(rTagged0))
    // tie-break on the carried columns: several right rows at the same
    // (key, ts) would otherwise make last() shuffle-order-dependent
    val w = Window.partitionBy(key)
      .orderBy((col("__ts") +: col("__side") +: carry.map(col)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carries the matched timestamp and every carried value
    // together, so they always come from the same (latest prior) right
    // row — per-column last(ignoreNulls) would let a null carry value
    // fall back to an OLDER right row than the matched timestamp, unlike
    // DuckDB ASOF which takes all values from the single matched row
    val rightRow = when(col("__side") === 0,
      struct((col("__ts").as("__matched_ts") +:
        carry.map(c => col(c).as(c))): _*))
    val carried = unioned.withColumn("__asof",
      last(rightRow, ignoreNulls = true).over(w))
    val withinTolerance: org.apache.spark.sql.Column = tolerance match {
      case Some(t) =>
        col("__asof.__matched_ts") >= col(leftTs) - expr(s"INTERVAL $t")
      case None => col("__asof").isNotNull
    }
    carried
      .filter(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) ++
        carry.map(c => when(withinTolerance, col("__asof").getField(c))
          .otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
