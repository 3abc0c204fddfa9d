package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join WITHOUT the nested loop Spark plans for a raw
  * `s1 < e2 AND s2 < e1` theta join (BroadcastNestedLoopJoin — quadratic
  * work, the non-equi scale-killer; see also [[AsOfJoin]] for the
  * nearest-PRIOR variant of temporal joining).
  *
  * Bucket decomposition (the standard distributed interval-join
  * reformulation, as in interval partitioning for overlap joins): each
  * interval explodes into the fixed-width time buckets it touches;
  * overlapping intervals MUST share a bucket, so a bucket equi-join
  * generates candidates, pairs dedup ids-only, and the exact predicate
  * verifies on one id-keyed join per side. Shuffles carry
  * `(bucket, id, start, end)` — never payloads.
  *
  * Bucket-width discipline: fan-out per interval is
  * `⌈length/width⌉ (+1)`, per-bucket population is what one task
  * verifies. Pick width near the typical interval length — wider buckets
  * cut fan-out but grow per-bucket candidate blocks; a heavy tail of
  * LONG intervals (each touching thousands of buckets) wants the
  * two-tier split (long intervals broadcast, short ones bucketed) noted
  * in the scaladoc rather than a narrower width.
  *
  * Intervals are half-open `[start, end)`; rows with `end <= start` are
  * empty and never pair. Overlap is reported in exact integer
  * microseconds (`least(e)-greatest(s)` on `unix_micros` — no FP).
  */
object IntervalJoin {

  /** All pairs of (left, right) intervals with positive overlap.
    *
    * Inputs: each side carries (idCol, startCol, endCol) with
    * timestamp-typed bounds; ids unique per side.
    *
    * @return (left id, right id, overlap_us) with the original bound
    *         columns preserved as l_start/l_end/r_start/r_end
    */
  def overlapJoin(left: DataFrame, lId: String, lStart: String,
      lEnd: String, right: DataFrame, rId: String, rStart: String,
      rEnd: String, bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0,
      s"bucketWidthSec must be positive, got $bucketWidthSec")
    val w = bucketWidthSec * 1000000L
    def prep(df: DataFrame, id: String, s: String, e: String,
        tag: String): DataFrame =
      df.select(col(id).as(s"${tag}_id"),
          unix_micros(col(s)).as(s"${tag}_s"),
          unix_micros(col(e)).as(s"${tag}_e"))
        .filter(col(s"${tag}_e") > col(s"${tag}_s"))
    val l = prep(left, lId, lStart, lEnd, "l")
    val r = prep(right, rId, rStart, rEnd, "r")
    def bucketed(df: DataFrame, tag: String): DataFrame =
      df.select(col(s"${tag}_id"),
        explode(sequence(
          floor(col(s"${tag}_s") / w).cast("long"),
          floor((col(s"${tag}_e") - 1) / w).cast("long"))).as("__bk"))
    // candidates: ids only, dedup'd (an overlapping pair can share
    // several buckets); the exact predicate re-verifies after the
    // id-keyed joins re-attach the bounds
    val cand = bucketed(l, "l").join(bucketed(r, "r"), "__bk")
      .select("l_id", "r_id").distinct()
    cand.join(l, "l_id").join(r, "r_id")
      .filter(col("l_s") < col("r_e") && col("r_s") < col("l_e"))
      .select(col("l_id"), col("r_id"),
        (least(col("l_e"), col("r_e")) -
          greatest(col("l_s"), col("r_s"))).as("overlap_us"),
        timestamp_micros(col("l_s")).as("l_start"),
        timestamp_micros(col("l_e")).as("l_end"),
        timestamp_micros(col("r_s")).as("r_start"),
        timestamp_micros(col("r_e")).as("r_end"))
  }

  /** Two-tier overlap join for interval sets with a heavy-tailed length
    * distribution: a rare LONG interval (a week-long maintenance window
    * among 10-minute incidents) touches thousands of buckets under
    * [[overlapJoin]] — bucket fan-out ×length. Here intervals at or
    * above `longThresholdSec` peel off into a broadcast tier joined by
    * the raw overlap predicate (BroadcastNestedLoopJoin with the TINY
    * long side as the hinted build — the intended shape, same as the
    * probe-broadcast ANN joins), while the short×short bulk runs the
    * bucket decomposition. The three pieces (short×short, long-left ×
    * all-right, short-left × long-right) are disjoint by construction,
    * so the union needs no dedup. Falls over loudly if the "long" tier
    * is not actually small — the broadcast threshold enforces the
    * contract.
    *
    * Same output contract as [[overlapJoin]]. */
  def overlapJoinTwoTier(left: DataFrame, lId: String, lStart: String,
      lEnd: String, right: DataFrame, rId: String, rStart: String,
      rEnd: String, bucketWidthSec: Long,
      longThresholdSec: Long): DataFrame = {
    require(longThresholdSec > 0,
      s"longThresholdSec must be positive, got $longThresholdSec")
    val thrUs = longThresholdSec * 1000000L
    def lenUs(s: String, e: String) =
      unix_micros(col(e)) - unix_micros(col(s))
    val lShort = left.filter(lenUs(lStart, lEnd) < thrUs)
    val lLong = left.filter(lenUs(lStart, lEnd) >= thrUs)
    val rShort = right.filter(lenUs(rStart, rEnd) < thrUs)
    val rLong = right.filter(lenUs(rStart, rEnd) >= thrUs)
    def theta(lf: DataFrame, rf: DataFrame,
        broadcastLeft: Boolean): DataFrame = {
      val l = lf.select(col(lId).as("l_id"),
          unix_micros(col(lStart)).as("l_s"),
          unix_micros(col(lEnd)).as("l_e"))
        .filter(col("l_e") > col("l_s"))
      val r = rf.select(col(rId).as("r_id"),
          unix_micros(col(rStart)).as("r_s"),
          unix_micros(col(rEnd)).as("r_e"))
        .filter(col("r_e") > col("r_s"))
      val (lc, rc) = if (broadcastLeft) (broadcast(l), r)
        else (l, broadcast(r))
      lc.join(rc, col("l_s") < col("r_e") && col("r_s") < col("l_e"))
        .select(col("l_id"), col("r_id"),
          (least(col("l_e"), col("r_e")) -
            greatest(col("l_s"), col("r_s"))).as("overlap_us"),
          timestamp_micros(col("l_s")).as("l_start"),
          timestamp_micros(col("l_e")).as("l_end"),
          timestamp_micros(col("r_s")).as("r_start"),
          timestamp_micros(col("r_e")).as("r_end"))
    }
    overlapJoin(lShort, lId, lStart, lEnd, rShort, rId, rStart, rEnd,
        bucketWidthSec)
      .unionAll(theta(lLong, right, broadcastLeft = true))
      .unionAll(theta(lShort, rLong, broadcastLeft = false))
  }

  /** Merge overlapping-or-touching intervals per key into maximal
    * "islands" (gaps-and-islands): availability windows, coverage
    * spans, outage consolidation. Pure window algebra — no self-join:
    * an interval starts a new island iff its start exceeds the running
    * max end of everything before it (ordered by (start, end)), and
    * the island id is the running sum of those flags. Cost is one
    * shuffle on `key` + one partial agg; intervals of one key must fit
    * one task's window partition (the usual per-key window caveat —
    * a whale key wants time-bucketed pre-merge first).
    *
    * Intervals are CLOSED on both ends for merging purposes: touching
    * intervals ([1,5],[5,9]) merge. Rows with end < start fail loudly
    * in-plan — a reversed interval would silently poison the running
    * max.
    *
    * @return one row per island: key columns, island_start, island_end,
    *         n_intervals
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val s = col(startCol)
    val e = when(col(endCol) < col(startCol),
      raise_error(concat(lit("mergeIntervals: end < start at "),
        col(startCol).cast("string")))).otherwise(col(endCol))
    val ordered = Window.partitionBy(keys: _*).orderBy(s.asc, e.asc)
    val prevMaxEnd = max(e).over(
      ordered.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df
      .withColumn("__new_island",
        when(prevMaxEnd.isNull || s > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("__island",
        sum(col("__new_island")).over(
          ordered.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(keys :+ col("__island"): _*)
      .agg(min(s).as("island_start"), max(e).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(keys ++ Seq(col("island_start"), col("island_end"),
        col("n_intervals")): _*)
  }
}
