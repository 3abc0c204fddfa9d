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

  /** Categorical twin of [[numeric]]: the top-`k` most frequent values
    * per column (count desc, value asc — deterministic under ties),
    * long format (column, value, cnt, rank). Values surface as strings;
    * profile STRING-typed columns when the output must hash-match
    * across engines (numeric→string formatting is engine-specific).
    *
    * Scale shape: ONE scan explodes to (column, value) pairs, a
    * partial-aggregable count, and [[TopK.perGroup]] bounds each
    * column's survivors at `k` rows per task — no full sort, no value
    * list ever collects. */
  def categorical(df: DataFrame, cols: Seq[String], k: Int = 3)
      : DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(k >= 1, s"k must be >= 1, got $k")
    val long = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"),
          col(c).cast("string").as("value"))): _*)).as("p"))
      .select("p.*")
      .filter(col("value").isNotNull)
    val counts = long.groupBy("column", "value")
      .agg(count(lit(1)).as("cnt"))
    val top = TopK.perGroup(counts, Seq("column"), "cnt", k,
      desc = true, tieBreak = Seq("value"))
    // survivors are ≤ k per column — the rank window is tiny
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy("column")
        .orderBy(col("cnt").desc, col("value"))))
  }
}
