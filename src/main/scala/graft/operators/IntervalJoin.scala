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
}
