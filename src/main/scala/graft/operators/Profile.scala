package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling (data-quality triage for a 100 TB table):
  * row count, null count, exact distinct count, min and max for each
  * requested numeric column, emitted in long format — ONE aggregation
  * over ONE scan.
  *
  * Count-distinct across several columns in a single pass plans as
  * Expand (one row replica per profiled column before partial
  * aggregation) — the standard Spark shape for multi-distinct. That
  * trades ×|cols| map-side rows for a single scan of the table, the
  * right trade when the scan dominates (it does at 100 TB). Distincts
  * are EXACT so the DuckDB oracle hash-matches; swap in
  * `approx_count_distinct` when estimates suffice and the Expand should
  * go away.
  *
  * Numeric columns only by design: min/max surface as doubles, so the
  * long format needs no lossy string casts (whose engine-specific
  * formatting would break cross-engine comparison). */
object Profile {

  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))): _*)).as("p"))
      .select("p.*")
  }
}
