package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — gap-based session assignment over an event
  * log, the offline twin of the streaming `session_window` aggregate
  * ([[graft.streaming.StreamOps]], SURVEY §2B E30): a session breaks
  * wherever a key's gap between consecutive events exceeds `gapSec`.
  * Batch pipelines need the same segmentation when re-processing a
  * historical log (feature backfill, funnel analysis, training-data
  * assembly from interaction logs) where replaying through a stateful
  * stream would cost a state store for no benefit.
  *
  * The classic two-window formulation: flag rows whose gap from the
  * previous event exceeds the threshold (lag), then running-sum the
  * flags into a per-key session ordinal (cumulative sum) — both windows
  * share ONE partitioning, and the per-session aggregate groups by
  * (key, ordinal), a subset-compatible clustering, so the whole
  * operator costs exactly ONE shuffle on the key column at any scale.
  * Ordering is made total (ts, then id column) so session ordinals are
  * deterministic under timestamp ties and the result is
  * engine-reproducible (the DuckDB oracle runs the same two windows).
  */
object Sessionize {

  /** Per-event session assignment: appends `session_seq` (1-based
    * per-key session ordinal) and `is_session_start`. */
  def assign(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gapSec must be positive, got $gapSec")
    val order = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val running = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__prev_us",
        lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("is_session_start",
        col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapSec * 1000000L)
      .withColumn("session_seq",
        sum(col("is_session_start").cast("long")).over(running))
      .drop("__prev_us")
  }

  /** Per-session rollup: (key, session_seq, n_events, session_start,
    * session_end, duration_sec). Groups by (key, session_seq) — clustered
    * compatibly with [[assign]]'s window partitioning, so no second
    * exchange. */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      gapSec: Long): DataFrame =
    assign(df, keyCol, tsCol, idCol, gapSec)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        ((unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          / 1000000L).cast("long").as("duration_sec"))
}
