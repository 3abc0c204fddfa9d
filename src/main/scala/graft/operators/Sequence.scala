package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global sequence assignment — contiguous ids `0..N-1` in a
  * total order, WITHOUT the single-partition window that
  * `row_number() OVER (ORDER BY ...)` plans to (Spark moves every row to
  * one task for an unpartitioned window — the classic scale-killer; at
  * 100 TB that task never finishes).
  *
  * Two-phase bucket-offset scheme (the same idea as `zipWithIndex`, kept
  * in the DataFrame layer so codegen and column pruning survive):
  *  1. count rows per BUCKET, where the bucket expression is a coarse,
  *     order-aligned prefix of the sort order (a date for time-ordered
  *     logs, a key range for keyed data). The per-bucket running-total
  *     offsets are computed with a window over the bucket COUNTS — one
  *     row per bucket, thousands at most, so the unpartitioned window is
  *     trivial by construction.
  *  2. `row_number()` partitioned BY bucket (parallel, one sort per
  *     bucket) plus the broadcast-joined bucket offset gives the global
  *     sequence.
  *
  * Requirements: `bucket` must be a coarsening of the leading sort key
  * (rows in a smaller bucket all precede rows in a larger one), and
  * `(bucket, orderCols)` must be a total order for the output to be
  * deterministic. Bucket skew bounds per-task sort size: pick buckets so
  * the largest holds what one task can sort (days → hours at higher
  * volume).
  *
  * Training-pipeline uses: stable example ids before sharding, exact
  * offset manifests for sequence packing, resumable cursor positions.
  */
object Sequence {

  /** Adds `outCol` = global 0-based sequence in `(bucket, orderCols)`
    * order. A NULL bucket (e.g. `to_date` of a null timestamp) is a
    * bucket like any other — it sorts first (Spark null-first order),
    * its rows sequence from 0, and the null-safe offsets join keeps
    * them (a plain equi-join would silently DROP those rows while
    * still counting them into every other bucket's offset). */
  def assignGlobalSeq(df: DataFrame, bucket: Column,
      orderCols: Seq[Column], outCol: String = "seq"): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val withBk = df.withColumn("__bk", bucket)
    val counts = withBk.groupBy(col("__bk")).agg(count(lit(1)).as("__cnt"))
    // one row per bucket: the only whole-table window, sized in buckets.
    // Bounded.constPart is the repo's bounded-window marker — same
    // single-partition execution, but the non-empty partition spec marks
    // the window as deliberately bounded so the unpartitioned-window
    // plan sweep (PlanShapeSpec) only fires on genuine data-window
    // scale bugs
    val offsets = counts.withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(Bounded.constPart(col("__cnt")))
            .orderBy(col("__bk"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__off"))
    withBk.join(broadcast(offsets), col("__bk") <=> col("__bk2"))
      .withColumn(outCol,
        col("__off") + row_number().over(
          Window.partitionBy(col("__bk")).orderBy(orderCols: _*)) - 1)
      .drop("__bk", "__bk2", "__off")
  }
}
