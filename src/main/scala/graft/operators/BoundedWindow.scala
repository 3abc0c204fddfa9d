package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Marker partition key for DELIBERATELY single-partition windows over
  * BOUNDED inputs (per-bucket count tables, top-V vocabularies — never
  * data rows): a constant-valued but non-foldable expression. Why not
  * the obvious alternatives:
  *
  *   - `Window.orderBy(...)` (empty partition spec) is indistinguishable
  *     from the genuine scale bug the unpartitioned-window plan sweep
  *     (PlanShapeSpec) hunts — an ORDER-BY-everything window over DATA
  *     rows is a one-task sort at 100 TB — and `WindowExec` logs its
  *     "No Partition Defined" warning on every run, burying real WARNs.
  *   - `partitionBy(lit(0))` is folded away by Spark 4's
  *     `EliminateWindowPartitions` optimizer rule (foldable partition
  *     keys are dropped), landing right back on the empty spec.
  *     `anchor * 0` is likewise simplified to the 0 literal when the
  *     anchor is non-nullable (counts always are) and folded too —
  *     verified empirically against 4.1.2.
  *   - `coalesce(anchor - anchor, 0)` survives optimization (`x - x`
  *     has no simplification rule — it is null-preserving, so a
  *     constant-fold to 0 would be wrong for nullable x) and evaluates
  *     to 0 on every row: one partition, the same execution as the
  *     unpartitioned form, but the plan carries a non-empty partition
  *     spec (the sweep's bounded-window marker) and the log stays
  *     clean.
  */
object Bounded {

  /** @param anchor any NUMERIC column of the bounded table — use the
    *               count/total column; for a null anchor the coalesce
    *               maps `null - null` to 0, so every row lands in the
    *               same partition regardless */
  def constPart(anchor: Column): Column =
    coalesce(anchor - anchor, lit(0))
}
